#!/usr/bin/env python
"""Train a text tokenizer compatible with the T3 text front-end.

The reference consumes a ~704-token BPE (`tokenizer.json`) from the model
snapshot. When training/fine-tuning from scratch, this script builds an
equivalent one from a text corpus: lowercased BPE with the ``[SPACE]``
word-separator convention and the UNK/STOP/START special ids the serving
stack expects (stop_text_token=0, start_text_token=255 by convention of the
checkpoint family).

Usage: python scripts/train_tokenizer.py corpus.txt [-o tokenizer.json] [--vocab 704]
"""
import argparse


def train(corpus_path: str, out_path: str, vocab_size: int) -> None:
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tokenizer = Tokenizer(models.BPE(unk_token="[UNK]"))
    tokenizer.pre_tokenizer = pre_tokenizers.Whitespace()

    def line_iter():
        with open(corpus_path, "r", encoding="utf-8") as fh:
            for line in fh:
                # serving-side preprocessing: lowercase, spaces → [SPACE]
                yield line.strip().lower().replace(" ", " [SPACE] ")

    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["[STOP]", "[UNK]", "[SPACE]"],
        show_progress=False,
    )
    tokenizer.train_from_iterator(line_iter(), trainer)
    tokenizer.save(out_path)
    print(f"tokenizer with {tokenizer.get_vocab_size()} tokens → {out_path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus")
    ap.add_argument("-o", "--out", default="tokenizer.json")
    ap.add_argument("--vocab", type=int, default=704)
    args = ap.parse_args()
    train(args.corpus, args.out, args.vocab)
