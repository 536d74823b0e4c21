"""Trainable naive-Bayes char-trigram language classifier — the
model-file path for language ID (the heuristic n-gram lang_id in
functions/textstats stays the zero-setup fallback; this is the
train → persist → load-once-per-actor → batch-score pipeline a real
fastText-style lang-id deployment has, with the training itself
distributed and the whole train+score computation SQL-oracle-checked).

Model: add-one-smoothed log P(trigram | lang) over a global top-V
trigram vocabulary (count desc, trigram asc — deterministic), plus a
per-lang OOV log-prob ln(1/(n_l + V)).  Score(doc, l) = Σ over the
doc's trigram OCCURRENCES of logp[l, t] (OOV occurrences contribute
the OOV term).  Prediction = argmax over 6dp-ROUNDED scores with
lang-ascending tie-break, so engine and oracle agree bit-for-bit.

Scale shape: training is two bucketed sums over slim
(lang, trigram, count) partials — text never shuffles; the finished
model is a bounded artifact (L×V floats ≈ 80 KB at V=2000) that is
driver-held BY DESIGN, persisted with np.savez, and loaded once per
scoring actor (broadcast via the object store, not re-read per batch).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _trigrams(text: str) -> List[str]:
    s = (text or "").lower()
    return [s[i : i + 3] for i in range(len(s) - 2)]


def train_langid_model(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    lang_col: str = "lang",
    vocab_size: int = 2000,
) -> dict:
    """One corpus pass → slim (lang, trigram, count) partials → two
    bucketed sums → model dict {langs, vocab, logp (L,V), oov (L,)}."""
    from .join import bucketed_sum

    def partial(batch: pa.Table) -> pa.Table:
        out_l: list = []
        out_g: list = []
        for lg, txt in zip(batch[lang_col].to_pylist(), batch[text_col].to_pylist()):
            gs = _trigrams(txt)
            out_l.extend([lg] * len(gs))
            out_g.extend(gs)
        t = pa.table(
            {"lang": pa.array(out_l, pa.string()), "g": pa.array(out_g, pa.string())}
        )
        agg = t.group_by(["lang", "g"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "lang": agg["lang"],
                "g": agg["g"],
                "cnt": agg["count_all"].cast(pa.float64()),
            }
        )

    counts = bucketed_sum(
        ds.map_batches(partial, batch_format="pyarrow"), ["lang", "g"], "cnt", "cnt"
    ).materialize()  # consumed twice: vocab totals + dense matrix

    # global top-V trigrams: per-block partial top-V, driver merge of
    # ≤ V·blocks rows (the exact_top_tokens discipline)
    totals = bucketed_sum(counts, ["g"], "cnt", "total")

    def partial_topv(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["total", "g"], ascending=[False, True], kind="mergesort"
        )
        return pa.Table.from_pandas(df.head(vocab_size), preserve_index=False)

    cand = (
        totals.map_batches(partial_topv, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["total", "g"], ascending=[False, True], kind="mergesort")
        .head(vocab_size)
    )
    vocab = sorted(cand["g"].tolist())
    v_index = pd.Index(vocab)
    V = len(vocab)

    # dense L×V counts: filter the distributed counts to the vocab and
    # collect — ≤ L·V rows, the model is a bounded driver artifact
    vset = pa.array(vocab, pa.string())

    def in_vocab(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["g"], value_set=vset))

    rows = counts.map_batches(in_vocab, batch_format="pyarrow").take_all()
    langs = sorted({r["lang"] for r in rows})
    L = len(langs)
    l_index = {l: i for i, l in enumerate(langs)}
    C = np.zeros((L, V), dtype=np.float64)
    for r in rows:
        C[l_index[r["lang"]], v_index.get_loc(r["g"])] = r["cnt"]
    n_l = C.sum(axis=1)
    logp = np.log((C + 1.0) / (n_l[:, None] + V))
    oov = np.log(1.0 / (n_l + V))
    return {"langs": langs, "vocab": vocab, "logp": logp, "oov": oov}


def save_langid_model(path: str, model: dict) -> str:
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        langs=np.array(model["langs"], dtype=object),
        vocab=np.array(model["vocab"], dtype=object),
        logp=model["logp"],
        oov=model["oov"],
    )
    return path if path.endswith(".npz") else path + ".npz"


def load_langid_model(path: str) -> dict:
    z = np.load(path, allow_pickle=True)
    return {
        "langs": [str(x) for x in z["langs"]],
        "vocab": [str(x) for x in z["vocab"]],
        "logp": z["logp"],
        "oov": z["oov"],
    }


class LangIdModelStage:
    """Actor-pool scoring stage: the model FILE is read once per actor
    in __init__ (the load-once contract, pytest-pinned), scoring is a
    vectorized get_indexer + bincount + one (L,V)@(V,) matmul per doc.

    Output: doc_id, score_<lang> (6dp) per model lang, pred_lang
    (argmax over the ROUNDED scores, lang-ascending tie-break)."""

    def __init__(self, model_path: str, id_col: str = "doc_id", text_col: str = "text"):
        self.model = load_langid_model(model_path)
        self.v_index = pd.Index(self.model["vocab"])
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = self.model["langs"]
        logp, oov = self.model["logp"], self.model["oov"]
        ids_out: list = []
        scores_out: list = []
        for i, txt in zip(
            batch[self.id_col].to_pylist(), batch[self.text_col].to_pylist()
        ):
            gs = _trigrams(txt)
            if not gs:
                continue  # <3 chars: no evidence — excluded, like the oracle
            idx = self.v_index.get_indexer(np.asarray(gs, dtype=object))
            n_oov = int((idx < 0).sum())
            v = np.bincount(idx[idx >= 0], minlength=len(self.v_index)).astype(
                np.float64
            )
            s = np.round(logp @ v + oov * n_oov, 6)
            ids_out.append(int(i))
            scores_out.append(s)
        S = (
            np.vstack(scores_out)
            if scores_out
            else np.empty((0, len(langs)), np.float64)
        )
        cols = {self.id_col: pa.array(ids_out, pa.int64())}
        for j, lg in enumerate(langs):
            cols[f"score_{lg}"] = pa.array(S[:, j], type=pa.float64())
        # argmax over rounded scores; langs sorted asc → first max wins ties
        pred = [langs[int(np.argmax(S[r]))] for r in range(len(ids_out))]
        cols["pred_lang"] = pa.array(pred, pa.string())
        return pa.table(cols)


def score_langid(
    ds: "ray.data.Dataset",
    model_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 2,
) -> "ray.data.Dataset":
    """Actor-pool inference over a persisted model file."""
    return ds.map_batches(
        LangIdModelStage,
        fn_constructor_args=(model_path, id_col, text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
