"""Unicode NFC normalization (functions/textnorm.py).  All non-ASCII
literals are written as explicit escapes so no editor/tooling layer can
silently re-normalize the fixtures."""

import unicodedata

import pyarrow as pa


class TestNfcNormalizeBatch:
    def test_combining_compatibility_and_ascii(self):
        from deepcrawl4ai_ray.functions.textnorm import nfc_normalize_batch

        decomposed = "café"  # e + combining acute
        angstrom = "x Å y"  # compatibility angstrom sign
        composed = "café"  # already NFC
        ascii_s = "plain ascii"
        out, changed = nfc_normalize_batch(
            pa.array([decomposed, angstrom, composed, ascii_s], pa.string())
        )
        vals = out.to_pylist()
        assert vals[0] == "café"
        assert vals[1] == "x Å y"
        assert vals[2] == composed
        assert vals[3] == ascii_s
        assert changed.to_pylist() == [True, True, False, False]

    def test_matches_unicodedata(self):
        from deepcrawl4ai_ray.functions.textnorm import nfc_normalize_batch

        samples = [
            "Å",  # A + combining ring -> U+00C5
            "ﬁle",  # fi ligature: NFC identity (compat only in NFKC)
            "Á̧",  # stacked marks: canonical reordering applies
            "ascii only",
            "",
            "mixed café and é",
        ]
        out, changed = nfc_normalize_batch(pa.array(samples, pa.string()))
        for s, o, c in zip(samples, out.to_pylist(), changed.to_pylist()):
            want = unicodedata.normalize("NFC", s)
            assert o == want
            assert c == (want != s)

    def test_nulls_pass_through(self):
        from deepcrawl4ai_ray.functions.textnorm import nfc_normalize_batch

        out, changed = nfc_normalize_batch(
            pa.array(["a", None, "é"], pa.string())
        )
        assert out.to_pylist() == ["a", None, "é"]
        assert changed.to_pylist() == [False, False, True]

    def test_empty(self):
        from deepcrawl4ai_ray.functions.textnorm import nfc_normalize_batch

        out, changed = nfc_normalize_batch(pa.array([], pa.string()))
        assert len(out) == 0 and len(changed) == 0
