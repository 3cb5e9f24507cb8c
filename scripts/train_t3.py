#!/usr/bin/env python
"""Fine-tune T3 on a manifest of (wav, transcript) pairs.

End-to-end training entry point: featurize with the serving models, run the
sharded train step over a (dp, tp) mesh, checkpoint in the native format the
engine serves directly.

Usage:
  python scripts/train_t3.py manifest.tsv --out ckpt_dir \
      [--steps 100] [--batch 4] [--lr 1e-5] [--dp N --tp M] [--tiny] [--cpu]

manifest.tsv: one `wav_path<TAB>transcript` per line.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("manifest")
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--dp", type=int, default=None)
    ap.add_argument("--tp", type=int, default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--max-speech", type=int, default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.tiny:
        os.environ["CHATTERBOX_TINY_MODEL"] = "1"

    import jax
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from chatterbox_tpu.logging_config import configure_logging, log
    from chatterbox_tpu.models.tokenizer import TextTokenizer
    from chatterbox_tpu.parallel import make_mesh, shard_params
    from chatterbox_tpu.parallel.mesh import AXES
    from chatterbox_tpu.runtime import TTSEngine
    from chatterbox_tpu.runtime.checkpoint import save_checkpoint
    from chatterbox_tpu.training import make_train_step
    from chatterbox_tpu.training.data import T3FeatureExtractor, load_manifest, make_batches

    configure_logging(tag="TRAIN")

    engine = TTSEngine()
    engine._init_models()
    cfg = engine.cfg

    pairs = load_manifest(args.manifest)
    if not pairs:
        raise SystemExit("empty manifest")
    log.info("Featurizing %d examples...", len(pairs))
    extractor = T3FeatureExtractor(engine.params, cfg, engine.tokenizer)
    examples = [extractor.extract(w, t) for w, t in pairs]

    use_mesh = (args.dp or 0) * (args.tp or 0) > 0 or args.tp or args.dp
    params = engine.params["t3"]
    mesh = None
    if use_mesh:
        mesh = make_mesh(dp=args.dp, tp=args.tp)
        params = shard_params(params, mesh)
        log.info("mesh: %s", dict(mesh.shape))

    optimizer = optax.adamw(args.lr)
    init_state, train_step = make_train_step(cfg.t3, optimizer)
    state = init_state(params)
    step_fn = jax.jit(train_step, donate_argnums=(0,))

    step = 0
    t0 = time.time()
    while step < args.steps:
        for batch in make_batches(
            examples, cfg.t3, args.batch,
            max_speech=args.max_speech, shuffle_seed=step,
        ):
            if mesh is not None:
                sh = NamedSharding(mesh, P(AXES.dp))
                batch = {k: jax.device_put(v, sh) for k, v in batch.items()}
                with mesh:
                    state, m = step_fn(state, batch)
            else:
                state, m = step_fn(state, batch)
            step += 1
            if step % 10 == 0 or step == 1:
                log.info(
                    "step %d: loss=%.4f grad_norm=%.2f (%.2fs/step)",
                    step, float(m["loss"]), float(m["grad_norm"]),
                    (time.time() - t0) / step,
                )
            if step >= args.steps:
                break

    engine.params["t3"] = jax.device_get(state["params"])
    save_checkpoint(args.out, engine.params, cfg)
    log.info("Saved fine-tuned checkpoint to %s", args.out)


if __name__ == "__main__":
    main()
