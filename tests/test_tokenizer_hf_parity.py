"""File-mode WordPiece parity vs HuggingFace ``BertTokenizer``.

The reference tokenizes dialogs with ``BertTokenizerFast`` from the hub
(src/xview_et/agent.py:125). Our native tokenizer claims exact token parity
when pointed at the same vocab.txt; this test proves it against the HF slow
tokenizer (pure python, no downloads) on a realistic vocab fixture:
punctuation splits, ##-continuations, accent stripping, unknown words, the
100-char word guard, padding and truncation.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from avdn_tpu.data.tokenizer import WordPieceTokenizer


VOCAB = (
    ["[PAD]"]
    + [f"[unused{i}]" for i in range(99)]
    + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    + list("abcdefghijklmnopqrstuvwxyz0123456789")
    + list(".,!?;:'\"-()/")
    + [
        "fly", "head", "north", "##ward", "over", "the", "build",
        "##ing", "##ings", "turn", "left", "right", "toward", "towards",
        "your", "destination", "is", "a", "gray", "roof", "##top", "house",
        "near", "parking", "lot", "cross", "road", "##s", "you", "will",
        "see", "it", "on", "side", "of", "river", "go", "straight", "until",
        "reach", "##ed", "then", "stop", "cafe", "highway", "inter",
        "##section", "que", "ins", "##truction", "drone", "move", "forward",
        "des", "##tin", "##ation", "2", "##0", "me", "##ters", "about",
        "at", "clock", "direction", "o", "##'", "s", "##s",
    ]
)


@pytest.fixture(scope="module")
def vocab_path(tmp_path_factory):
    # de-dup while preserving order (duplicate entries would shift HF ids)
    seen, vocab = set(), []
    for v in VOCAB:
        if v not in seen:
            seen.add(v)
            vocab.append(v)
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(vocab) + "\n", encoding="utf-8")
    return str(p)


DIALOGS = [
    "Fly northward over the buildings, then stop.",
    "[QUE] where is my destination? [INS] head towards the gray rooftop "
    "house near the parking lot.",
    "turn left at the interSECTION and go straight until you reach the river",
    "café on the right side!",                      # accent stripping
    "move forward about 20 meters at 3 o'clock direction",
    "zzzqqqxxy unknownword",                             # UNK fallbacks
    "a" * 120 + " short",                                # >100-char word → UNK
    "",                                                  # empty instruction
]


class TestHFParity:
    def test_token_ids_and_mask_match(self, vocab_path):
        hf = transformers.BertTokenizer(vocab_path, do_lower_case=True)
        ours = WordPieceTokenizer.from_vocab_file(vocab_path)

        enc = hf(DIALOGS, padding=True, return_tensors="np")
        ids, mask = ours(DIALOGS)

        np.testing.assert_array_equal(ids, enc["input_ids"])
        np.testing.assert_array_equal(mask, enc["attention_mask"])

    def test_truncation_matches(self, vocab_path):
        hf = transformers.BertTokenizer(vocab_path, do_lower_case=True)
        ours = WordPieceTokenizer.from_vocab_file(vocab_path)
        enc = hf(DIALOGS, padding="max_length", truncation=True, max_length=12,
                 return_tensors="np")
        ids, mask = ours(DIALOGS, max_length=12, pad_to=12)
        np.testing.assert_array_equal(ids, enc["input_ids"])
        np.testing.assert_array_equal(mask, enc["attention_mask"])

    def test_tokens_match_per_string(self, vocab_path):
        hf = transformers.BertTokenizer(vocab_path, do_lower_case=True)
        ours = WordPieceTokenizer.from_vocab_file(vocab_path)
        for s in DIALOGS:
            assert ours.tokenize(s) == hf.tokenize(s), s
