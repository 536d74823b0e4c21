"""fastText ``.vec``-format model loading + bag-of-means classification
— the REAL pretrained-model-file path for learned content filtering
(reference parity: the learned content-filter / LLM scoring hooks at
`/root/reference/api.py:211-227`, `/root/reference/tasks.py:173-192`).

On-disk format (public, word2vec/fastText text format): first line
``"<n> <dim>"``, then one row per token ``"<token> <f1> ... <fdim>"``.
A supervised fastText model factors into its INPUT matrix (one vector
per vocabulary token — what ``saveVectors``/``.vec`` dumps) and its
OUTPUT matrix (one vector per ``__label__X``); the logit of label L on
a document is ``out[L] · mean(in[w] for known tokens w)`` and softmax
never changes the argmax, so shipping the two ``.vec`` files reproduces
``predict()`` exactly.  We load both through the same parser (labels
are just tokens spelled ``__label__*``).

Distribution follows the broadcast-model recipe (stages/modelscore.py):
the files are parsed ONCE driver-side, the matrices ``ray.put`` once,
and each scoring actor fetches them once in ``__init__`` — workers
never touch the filesystem (object-store broadcast is the
multi-node-safe channel, not a shared FS).

Preprocessing contract (shared with the SQL oracle): tokens are
``[a-z0-9]+`` runs of the lower-cased text; out-of-vocabulary tokens
are skipped; a document with zero known tokens has the all-zero mean
(logit 0 for every label).  Logits round to 6 dp; argmax ties break to
the lexicographically smallest label (labels are sorted at load).
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

_TOKEN_RE = re.compile(r"[a-z0-9]+")

LABEL_PREFIX = "__label__"


def save_vec(path: str, tokens: Sequence[str], matrix: np.ndarray) -> str:
    """Write the word2vec/fastText ``.vec`` text format."""
    m = np.asarray(matrix, dtype=np.float64)
    if m.ndim != 2 or m.shape[0] != len(tokens):
        raise ValueError(f"matrix shape {m.shape} does not match {len(tokens)} tokens")
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"{m.shape[0]} {m.shape[1]}\n")
        for tok, row in zip(tokens, m):
            f.write(tok + " " + " ".join(repr(float(x)) for x in row) + "\n")
    return path


def load_vec(path: str) -> Tuple[List[str], np.ndarray]:
    """Parse a ``.vec`` file → (tokens, float64 matrix).  Validates the
    header and per-row dimensionality (a truncated download or a binary
    ``.bin`` passed by mistake fails loudly, not as garbage vectors)."""
    with open(path, "r", encoding="utf-8") as f:
        header = f.readline().split()
        if len(header) != 2:
            raise ValueError(f"{path}: bad .vec header {header!r} (want '<n> <dim>')")
        n, dim = int(header[0]), int(header[1])
        if not (1 <= n <= 50_000_000 and 1 <= dim <= 4096):
            raise ValueError(f"{path}: implausible .vec header n={n} dim={dim}")
        tokens: List[str] = []
        rows = np.empty((n, dim), dtype=np.float64)
        for i in range(n):
            parts = f.readline().rstrip("\n").split(" ")
            if len(parts) != dim + 1:
                raise ValueError(
                    f"{path}: row {i} has {len(parts) - 1} values, want {dim}"
                )
            tokens.append(parts[0])
            rows[i] = [float(x) for x in parts[1:]]
    return tokens, rows


def load_fasttext_model(vectors_path: str, labels_path: str):
    """Driver-side parse of the two ``.vec`` files → broadcastable tuple
    (vocab ndarray, input matrix, sorted label names, output matrix).
    Labels sort lexicographically so vectorized argmax (first max wins)
    IS the deterministic tie-break."""
    vocab, in_mat = load_vec(vectors_path)
    raw_labels, out_mat = load_vec(labels_path)
    names = [
        lbl[len(LABEL_PREFIX):] if lbl.startswith(LABEL_PREFIX) else lbl
        for lbl in raw_labels
    ]
    order = np.argsort(np.asarray(names, dtype=object))
    if in_mat.shape[1] != out_mat.shape[1]:
        raise ValueError(
            f"dim mismatch: vectors {in_mat.shape[1]} vs labels {out_mat.shape[1]}"
        )
    return (
        np.asarray(vocab, dtype=object),
        in_mat,
        [names[i] for i in order],
        out_mat[order],
    )


class FastTextScoreStage:
    """Actor-pool classification stage:
    ``map_batches(FastTextScoreStage, fn_constructor_kwargs=
    dict(model_ref=ray.put(load_fasttext_model(...))), concurrency=N)``.
    Model lands in each actor exactly once (``__init__``); ``__call__``
    scores a whole Arrow batch with numpy segment means + one matmul."""

    def __init__(self, model_ref, text_col: str = "text", keep_cols: Sequence[str] = ()):
        vocab, in_mat, labels, out_mat = (
            ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) else model_ref
        )
        self.index = pd.Index(vocab)
        self.in_mat = in_mat
        self.labels = np.asarray(labels, dtype=object)
        self.out_t = out_mat.T  # (dim, n_labels)
        self.text_col = text_col
        self.keep_cols = list(keep_cols)

    def _means(self, texts: List[str]) -> np.ndarray:
        n, dim = len(texts), self.in_mat.shape[1]
        toks: List[str] = []
        counts = np.empty(n, dtype=np.int64)
        for i, s in enumerate(texts):
            t = _TOKEN_RE.findall(s.lower())
            toks.extend(t)
            counts[i] = len(t)
        means = np.zeros((n, dim), dtype=np.float64)
        if not toks:
            return means
        idx = self.index.get_indexer(np.asarray(toks, dtype=object))
        valid = idx >= 0
        if not valid.any():
            return means
        doc_ids = np.repeat(np.arange(n), counts)[valid]
        vecs = self.in_mat[idx[valid]]
        k = np.bincount(doc_ids, minlength=n)
        nz = np.flatnonzero(k)
        starts = np.concatenate([[0], np.cumsum(k[nz])[:-1]])
        means[nz] = np.add.reduceat(vecs, starts, axis=0) / k[nz, None]
        return means

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        logits = np.round(self._means(texts) @ self.out_t, 6)
        best = np.argmax(logits, axis=1)  # first max = lexicographic tie-break
        cols = {c: batch[c] for c in self.keep_cols}
        cols["label"] = pa.array(self.labels[best], pa.string())
        cols["logit"] = pa.array(logits[np.arange(len(texts)), best], pa.float64())
        return pa.table(cols)


def fasttext_classify(
    ds: "ray.data.Dataset",
    vectors_path: str,
    labels_path: str,
    text_col: str = "text",
    keep_cols: Sequence[str] = ("doc_id",),
    concurrency: int = 4,
    batch_size: int = 1024,
) -> "ray.data.Dataset":
    """Classify every document: Dataset(*keep_cols, label, logit)."""
    model_ref = ray.put(load_fasttext_model(vectors_path, labels_path))
    return ds.map_batches(
        FastTextScoreStage,
        fn_constructor_kwargs={
            "model_ref": model_ref,
            "text_col": text_col,
            "keep_cols": keep_cols,
        },
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


# ---------------------------------------------------------------------------
# deterministic fixture model (no network in this sandbox: a tiny model is
# GENERATED on disk in the real format, plus exploded parquet twins so the
# DuckDB oracle can reproduce the identical scores — the WET-source
# discipline of sources/warc.py applied to model files)

#: fixture vocabulary: the synthetic corpus' word soup + common stopwords
_FIXTURE_WORDS = (
    "the a an and or of to in is are was were be been for on with as at by "
    "it this that from not has have had key order sort table scan merge part "
    "window small hash join batch stream spark dup fast slow row column index "
    "filter group limit select query plan stage block shard page text data"
).split()

_FIXTURE_LABELS = [LABEL_PREFIX + s for s in ("drop", "keep", "review")]


def _dyadic(rng: np.random.Generator, shape) -> np.ndarray:
    """Values k/256, k ∈ [-256, 256] — dyadic rationals whose sums stay
    EXACT in float64 at fixture scale, so engine (token-order reduceat)
    and oracle (arbitrary-order SUM) means are bit-identical."""
    return rng.integers(-256, 257, size=shape).astype(np.float64) / 256.0


def make_fixture_model(out_dir: str, dim: int = 16, seed: int = 7) -> dict:
    """Write ``vectors.vec`` + ``labels.vec`` (real format, what the
    engine loads) and ``vectors.parquet`` + ``labels.parquet`` exploded
    to (token|label, dim, val) rows (what the SQL oracle reads).
    Returns the four paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    in_mat = _dyadic(rng, (len(_FIXTURE_WORDS), dim))
    out_mat = _dyadic(rng, (len(_FIXTURE_LABELS), dim))
    paths = {
        "vectors_vec": os.path.join(out_dir, "vectors.vec"),
        "labels_vec": os.path.join(out_dir, "labels.vec"),
        "vectors_parquet": os.path.join(out_dir, "vectors.parquet"),
        "labels_parquet": os.path.join(out_dir, "labels.parquet"),
    }
    save_vec(paths["vectors_vec"], _FIXTURE_WORDS, in_mat)
    save_vec(paths["labels_vec"], _FIXTURE_LABELS, out_mat)
    import pyarrow.parquet as pq

    n_tok, n_lbl = len(_FIXTURE_WORDS), len(_FIXTURE_LABELS)
    pq.write_table(
        pa.table(
            {
                "token": pa.array(np.repeat(_FIXTURE_WORDS, dim), pa.string()),
                "dim": pa.array(np.tile(np.arange(dim), n_tok), pa.int32()),
                "val": pa.array(in_mat.ravel(), pa.float64()),
            }
        ),
        paths["vectors_parquet"],
    )
    labels_plain = [s[len(LABEL_PREFIX):] for s in _FIXTURE_LABELS]
    pq.write_table(
        pa.table(
            {
                "label": pa.array(np.repeat(labels_plain, dim), pa.string()),
                "dim": pa.array(np.tile(np.arange(dim), n_lbl), pa.int32()),
                "w": pa.array(out_mat.ravel(), pa.float64()),
            }
        ),
        paths["labels_parquet"],
    )
    return paths
