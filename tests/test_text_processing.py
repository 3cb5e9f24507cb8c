"""Text frontend tests.

Cases mirror the edge cases the reference author documented in the
commented-out harness at /root/reference/src/text_processing.py:198-266:
long-sentence splitting, single-word-chunk prevention, empty text, and
punctuation-free prose.
"""
from chatterbox_tpu.text import segment_sentences, split_text_into_chunks


def test_empty_text():
    assert split_text_into_chunks("", 50) == []
    assert split_text_into_chunks("   ", 50) == []
    assert split_text_into_chunks(None if False else "", 50) == []


def test_short_text_single_chunk():
    chunks = split_text_into_chunks("Hello world.", 100)
    assert chunks == ["Hello world."]


def test_capitalization_and_terminal_punct():
    chunks = split_text_into_chunks("hello world", 100)
    assert chunks == ["Hello world."]


def test_smart_punctuation_normalized():
    chunks = split_text_into_chunks("“Hello” — it’s here…", 100)
    assert len(chunks) >= 1
    joined = " ".join(chunks)
    assert "“" not in joined and "”" not in joined and "’" not in joined
    assert "…" not in joined and "—" not in joined


def test_respects_max_length():
    text = (
        "This is a very long sentence; it has multiple clauses, and it needs to be "
        "split carefully: by semicolons, by commas, and then by words if absolutely necessary."
    )
    chunks = split_text_into_chunks(text, 30)
    assert len(chunks) > 1
    # 10% merge buffer is the only allowed overflow
    assert all(len(c) <= 33 for c in chunks), [len(c) for c in chunks]


def test_small_chunk_merging():
    from chatterbox_tpu.text.processing import _merge_small

    # Mergeable within the 10% buffer: 10 + 1 + 5 = 16 <= 15 * 1.1
    assert _merge_small(["alpha beta", "gamma"], 15) == ["alpha beta gamma"]
    # Forward merge when there is no previous chunk
    assert _merge_small(["solo", "two words"], 15) == ["solo two words"]
    # Unavoidable small chunk stays (combined length exceeds the buffer)
    assert _merge_small(["a very long first chunk here", "tail"], 20) == [
        "a very long first chunk here",
        "tail",
    ]


def test_word_splitting_without_punctuation():
    text = " ".join(["word"] * 120)  # no sentence punctuation at all
    chunks = split_text_into_chunks(text, 70)
    assert len(chunks) > 1
    assert all(len(c) <= 77 for c in chunks)
    assert all(len(c.split()) >= 2 for c in chunks)
    # Nothing lost: same word count overall (ignoring added final period)
    total = " ".join(chunks).replace(".", "")
    assert len(total.split()) == 120


def test_multi_sentence_packing():
    text = "One two three. Four five six. Seven eight nine. Ten eleven twelve."
    chunks = split_text_into_chunks(text, 35)
    assert all(len(c) <= 38 for c in chunks)
    # Sentences preserved in order
    assert "One two three." in chunks[0]


def test_sentence_mode_none_max_length():
    text = "First sentence. Second one! Third one?"
    chunks = split_text_into_chunks(text, None)
    assert chunks == ["First sentence.", "Second one!", "Third one?"]


def test_segmenter_abbreviations():
    sents = segment_sentences("Dr. Smith went to Washington. He arrived at 5 p.m. sharp.")
    assert len(sents) == 2
    assert sents[0].startswith("Dr. Smith")


def test_segmenter_basic():
    sents = segment_sentences("Hello there! How are you? I am fine.")
    assert sents == ["Hello there!", "How are you?", "I am fine."]


def test_marvin_story_chunking():
    """The reference author's original stress case (commented harness at
    text_processing.py:198-227): multi-paragraph prose with smart quotes,
    em-dashes, parentheses and dialogue, chunked at 80 chars."""
    text = (
        "In a small coastal town where the waves whispered secrets to the shore, "
        "lived a cat named Marvin. Marvin wasn’t your ordinary cat—he wore round "
        "spectacles (don’t ask how they stayed on) and spent most of his afternoons "
        "reading newspapers in the town library’s window.\n\n"
        "Everyone assumed Marvin was just a quirky feline with a taste for sunlight "
        "and paper. But Marvin had a secret: he could understand everything.\n\n"
        "“Seriously?” Marvin meowed.\n\n"
        "Rollo shrugged. “Shiny. Smelled like soup. You understand.”\n\n"
        "Because some cats don’t chase mice. Some cats solve mysteries."
    )
    chunks = split_text_into_chunks(text, 80)
    assert len(chunks) >= 5
    # length constraint with the 10% merge buffer
    assert all(len(c) <= 88 for c in chunks), [(len(c), c) for c in chunks if len(c) > 88]
    # no words lost (modulo punctuation normalization)
    norm = lambda s: "".join(ch for ch in s.lower() if ch.isalnum())
    assert norm("".join(chunks)).startswith(norm("In a small coastal town")[:20])
    assert "mysteries" in chunks[-1]
    # smart punctuation normalized away
    joined = " ".join(chunks)
    assert all(ch not in joined for ch in "“”’—")


def test_very_long_continuous_text():
    """Punctuation-free prose: pure word-splitting with no orphaned words
    (reference harness case 'Very Long Continuous Text', max_length 70)."""
    words = ("robust chunking logic handles continuous prose without any "
             "punctuation cues relying purely on maximum length and merging "
             "rules ").split()
    text = " ".join(words * 40)  # ~2.4k chars, no sentence enders
    chunks = split_text_into_chunks(text, 70)
    assert len(chunks) > 10
    assert all(len(c) <= 77 for c in chunks)
    assert all(len(c.split()) >= 2 for c in chunks)
