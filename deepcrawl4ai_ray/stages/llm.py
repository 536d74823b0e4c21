"""LLM structured-extraction stage (M7; reference tasks.py:173-192,
triggers.py:55-65 — ``LLMExtractionStrategy(llm_config, schema,
extraction_type="schema", chunk_token_threshold=1200,
input_format="markdown")``).

No model runtime exists in this sandbox, so the inference call is a
clearly-marked deterministic stub (``FAKE_LLM=True``): it fills the
user's JSON schema's top-level string/number fields from document
statistics.  The Ray-side shape is real: an actor-pool map_batches
stage that chunks markdown to ``chunk_token_threshold`` tokens, runs
"inference" per chunk, and emits one JSON string per input row — swap
``_infer`` for a real client on a cluster with one.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import pyarrow as pa

FAKE_LLM = True


class LLMExtractStage:
    """map_batches(LLMExtractStage, fn_constructor_args=(schema, instruction),
    concurrency=N) — one actor per replica holds client/config state."""

    def __init__(
        self,
        schema: Dict[str, Any],
        instruction: str = "",
        text_col: str = "text",
        id_col: str = "doc_id",
        chunk_token_threshold: int = 1200,
    ):
        self.schema = schema
        self.instruction = instruction
        self.text_col = text_col
        self.id_col = id_col
        self.chunk_token_threshold = chunk_token_threshold

    def _chunks(self, text: str):
        toks = text.split(" ")
        for i in range(0, max(1, len(toks)), self.chunk_token_threshold):
            yield " ".join(toks[i : i + self.chunk_token_threshold])

    def _infer(self, chunk: str) -> Dict[str, Any]:
        if not FAKE_LLM:  # pragma: no cover
            raise NotImplementedError("real LLM extraction requires a model endpoint")
        out: Dict[str, Any] = {}
        props = self.schema.get("properties", {})
        # split on ' ' exactly (no run-collapsing) to match the oracle's
        # string_split(trim(text), ' ') token spec for arbitrary inputs
        words = chunk.split(" ")
        for name, spec in props.items():
            t = spec.get("type", "string")
            if t == "string":
                out[name] = " ".join(words[:5])
            elif t in ("integer", "number"):
                out[name] = len(words)
            elif t == "boolean":
                out[name] = len(words) % 2 == 0
            else:
                out[name] = None
        return out

    def _merge(self, per_chunk: list, total_words: int) -> Dict[str, Any]:
        """Chunk results → one record: numeric fields SUM across chunks
        (count semantics), strings come from the FIRST chunk, booleans
        recomputed from the total word count — so chunked and unchunked
        inputs produce identical records (matches the whole-text oracle)."""
        merged: Dict[str, Any] = {}
        props = self.schema.get("properties", {})
        for name, spec in props.items():
            t = spec.get("type", "string")
            if t in ("integer", "number"):
                merged[name] = sum(p[name] for p in per_chunk)
            elif t == "boolean":
                merged[name] = total_words % 2 == 0
            else:
                merged[name] = per_chunk[0][name]
        return merged

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        extracted = []
        for t in texts:
            stripped = (t or "").strip()
            chunks = list(self._chunks(stripped))
            per = [self._infer(c) for c in chunks]
            merged = self._merge(per, len(stripped.split(" ")))
            extracted.append(json.dumps(merged, sort_keys=True))
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "extracted_content": pa.array(extracted, pa.string()),
            }
        )
