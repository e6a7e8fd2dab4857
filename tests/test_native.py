"""Native C++ host-preprocessing library vs OpenCV parity."""

import numpy as np
import cv2
import pytest

from avdn_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


class TestAreaResize:
    def test_downscale_matches_cv2(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (240, 320, 3), np.uint8)
        for dh, dw in ((120, 160), (240, 267), (100, 320), (60, 40)):
            want = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_AREA)
            got = native.area_resize(img, dh, dw)
            diff = np.abs(got.astype(int) - want.astype(int))
            # INTER_AREA uses fixed-point arithmetic; allow ±1 intensity
            assert np.percentile(diff, 99.5) <= 1, (dh, dw, diff.max())

    def test_identity(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (64, 64, 3), np.uint8)
        got = native.area_resize(img, 64, 64)
        np.testing.assert_array_equal(got, img)


class TestSwapRB:
    def test_matches_slice_reverse(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (32, 32, 3), np.uint8)
        want = img[:, :, ::-1].copy()
        got = native.swap_rb(img.copy())
        np.testing.assert_array_equal(got, want)


class TestFillCircles:
    def test_matches_cv2_circle(self):
        circles = np.array([[50, 60, 20], [120, 40, 10]], np.float32)
        want = np.zeros((100, 160), np.uint8)
        for cx, cy, r in circles:
            cv2.circle(want, (int(cx), int(cy)), int(r), 255, -1)
        got = native.fill_circles(100, 160, circles)
        # rasterisation boundary conventions differ by <= a 1px ring
        frac_diff = np.mean(got != want)
        assert frac_diff < 0.01, frac_diff


@pytest.mark.skipif(not native.wp_available(),
                    reason="native lib lacks wp_* (stale build)")
class TestNativeWordPiece:
    """C++ WordPiece encoder ≡ the pure-Python tokenizer (the hot batch
    path of train/eval/serving batch assembly, data/batcher.py:90-93)."""

    TEXTS = [
        "Move forward toward the GRAY building, then turn left!",
        "it's at 3 o'clock; a red-roofed structure.",
        "",
        "   ",
        "!!!",
        "word " * 200,                      # truncation path
        "a" * 150 + " ok",                  # max_chars_per_word -> [UNK]
        "tab\tand\nnewline\rsplits",
        "ctrl\x01chars\x02vanish",          # control chars drop, word joins
        "[QUE] does punctuation [ANS] split correctly?",
    ]
    NON_ASCII = ["café au lait", "naïve mover", "über — dash"]

    def _check(self, tok, texts, max_length=32, pad_to=40):
        ids_n, mask_n = tok(texts, max_length=max_length, pad_to=pad_to)
        ids_p, mask_p = tok._encode_python(texts, max_length=max_length,
                                           pad_to=pad_to)
        assert tok._native is not None, "native path was not engaged"
        np.testing.assert_array_equal(ids_n, ids_p)
        np.testing.assert_array_equal(mask_n, mask_p)

    def test_hashed_fallback_mode_parity(self):
        from avdn_tpu.data.tokenizer import WordPieceTokenizer

        self._check(WordPieceTokenizer.fallback(), self.TEXTS)

    def test_real_vocab_mode_parity(self):
        from avdn_tpu.data.tokenizer import WordPieceTokenizer

        vocab_toks = (["[PAD]"] + [f"unused{i}" for i in range(99)]
                      + ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                      + ["move", "forward", "the", "gray", "build", "##ing",
                         "turn", "left", "at", "red", "-", ",", "!", ".",
                         "'", ";", "?", "a", "##a", "word", "##s", "ok",
                         "it", "s", "o", "3", "[", "]", "que", "ans"])
        tok = WordPieceTokenizer({t: i for i, t in enumerate(vocab_toks)})
        self._check(tok, self.TEXTS)

    def test_non_ascii_falls_back_per_text(self):
        from avdn_tpu.data.tokenizer import WordPieceTokenizer

        tok = WordPieceTokenizer.fallback()
        mixed = [self.TEXTS[0]] + self.NON_ASCII + [self.TEXTS[1]]
        self._check(tok, mixed)

    def test_pad_shorter_than_sequence_truncates_like_python(self):
        from avdn_tpu.data.tokenizer import WordPieceTokenizer

        tok = WordPieceTokenizer.fallback()
        # pad_to < len([CLS]+toks+[SEP]): row is a plain prefix, SEP cut
        self._check(tok, ["one two three four five six"],
                    max_length=32, pad_to=5)

    def test_env_kill_switch(self, monkeypatch):
        from avdn_tpu.data.tokenizer import WordPieceTokenizer

        monkeypatch.setenv("AVDN_NATIVE_TOKENIZER", "0")
        tok = WordPieceTokenizer.fallback()
        tok(["hello world"], max_length=8, pad_to=8)
        assert tok._native is None
