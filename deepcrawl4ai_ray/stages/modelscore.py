"""Broadcast-model batch inference — the quality-classifier pattern of
a training-data pipeline (fastText/logreg-style doc filters), expressed
as the canonical Ray Data recipe: model weights are ``ray.put`` ONCE on
the driver, each scoring actor fetches them ONCE in ``__init__`` (zero
per-batch shipping), and ``__call__`` scores whole Arrow batches with
vectorized kernels.

The reference's nearest analog is its per-task LLM scoring hook
(tasks.py:173-192) — a per-row remote call; here the "model" is a
deterministic linear scorer over fully SQL-expressible text features so
the whole inference pass is hash-checked against a DuckDB oracle (the
plumbing — broadcast, actor pool, batched vectorized inference — is
exactly what a real fastText/ONNX model would use; only the kernel
inside ``_score`` would change).

Features (per document, each with an exact DuckDB equivalent):
  f1 = ln(1 + length(text))                       -- size signal
  f2 = spaces / (length + 1)                      -- whitespace ratio
  f3 = digit_chars / (length + 1)                 -- digit density
score = w0 + w1*f1 + w2*f2 + w3*f3, rounded to 6 dp per row (keeps the
pass/fail cut and all downstream aggregates bit-stable across engines).
"""

from __future__ import annotations

import struct
from typing import Dict, Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray

DEFAULT_WEIGHTS = (0.10, 0.35, -2.00, 1.50)  # (w0, w1_len, w2_space, w3_digit)

#: on-disk linear-model format (fastText-style single artifact, minimal):
#: magic ``DC4RLIN1`` | uint32 LE n_weights | n×float64 LE.  The file is
#: parsed ONCE on the driver and the weights broadcast via ``ray.put`` —
#: workers never need the path to exist locally (object-store broadcast
#: is the multi-node-safe model-distribution channel, not a shared FS).
MODEL_MAGIC = b"DC4RLIN1"


def save_linear_model(path: str, weights: Sequence[float] = DEFAULT_WEIGHTS) -> str:
    """Serialize a linear scorer to ``path`` (see MODEL_MAGIC format)."""
    w = [float(x) for x in weights]
    with open(path, "wb") as f:
        f.write(MODEL_MAGIC)
        f.write(struct.pack("<I", len(w)))
        f.write(struct.pack(f"<{len(w)}d", *w))
    return path


def load_linear_model(path: str) -> tuple:
    """Parse a model file written by :func:`save_linear_model`."""
    with open(path, "rb") as f:
        magic = f.read(len(MODEL_MAGIC))
        if magic != MODEL_MAGIC:
            raise ValueError(f"{path}: bad model magic {magic!r} (want {MODEL_MAGIC!r})")
        (n,) = struct.unpack("<I", f.read(4))
        if not 1 <= n <= 1_000_000:
            raise ValueError(f"{path}: implausible weight count {n}")
        return struct.unpack(f"<{n}d", f.read(8 * n))


class LinearScoreStage:
    """Actor-pool scoring stage: ``map_batches(LinearScoreStage,
    fn_constructor_kwargs=dict(weights_ref=ray.put(w)), concurrency=N)``.
    Weights land in the actor exactly once (``__init__``)."""

    def __init__(self, weights_ref, text_col: str = "text", out_col: str = "score"):
        w = ray.get(weights_ref) if isinstance(weights_ref, ray.ObjectRef) else weights_ref
        if len(w) != 4:
            raise ValueError(f"expected 4 weights (w0,w1,w2,w3), got {len(w)}")
        self.w: Sequence[float] = tuple(float(x) for x in w)
        self.text_col = text_col
        self.out_col = out_col

    def _score(self, text: pa.ChunkedArray | pa.Array) -> pa.Array:
        w0, w1, w2, w3 = self.w
        n = pc.cast(pc.utf8_length(text), pa.float64())
        spaces = pc.cast(pc.count_substring(text, " "), pa.float64())
        digits = pc.cast(pc.count_substring_regex(text, "[0-9]"), pa.float64())
        denom = pc.add(n, 1.0)
        f1 = pc.ln(pc.add(n, 1.0))
        f2 = pc.divide(spaces, denom)
        f3 = pc.divide(digits, denom)
        score = pc.add(
            pc.add(pc.multiply(f1, w1), w0),
            pc.add(pc.multiply(f2, w2), pc.multiply(f3, w3)),
        )
        return pc.round(score, ndigits=6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(self.out_col, self._score(batch[self.text_col]))


def score_sql_expr(text_col: str = "text", weights: Sequence[float] = DEFAULT_WEIGHTS) -> str:
    """The DuckDB expression computing the identical per-row score —
    keeps engine and oracle formulas from drifting apart."""
    w0, w1, w2, w3 = weights
    t = text_col
    return (
        f"ROUND({w0} + {w1} * ln(1 + length({t})) "
        f"+ ({w2}) * ((length({t}) - length(replace({t}, ' ', ''))) / (length({t}) + 1.0)) "
        f"+ {w3} * (len(regexp_extract_all({t}, '[0-9]')) / (length({t}) + 1.0)), 6)"
    )


def quality_model_stage(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    weights: Sequence[float] = DEFAULT_WEIGHTS,
    concurrency: int = 4,
    batch_size: int = 1024,
    model_path: str | None = None,
) -> "ray.data.Dataset":
    """Attach a ``score`` column via the broadcast-weights actor pool.

    ``model_path`` exercises the real model-distribution plumbing: the
    file is parsed once driver-side (:func:`load_linear_model`) and the
    weights broadcast — identical output to passing ``weights`` directly.
    """
    if model_path is not None:
        weights = load_linear_model(model_path)
    ref = ray.put(tuple(float(x) for x in weights))
    return ds.map_batches(
        LinearScoreStage,
        fn_constructor_kwargs={"weights_ref": ref, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
