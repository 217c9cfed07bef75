"""Pairwise scoring (SURVEY.md §2.11) — Arrow-batched pandas UDFs only.

Three signals per the north star, combined as a weighted column expression
(pattern of LATTE's composite score r = w_f·f + w_g·g,
`/root/reference/LATTE/modeling_LATTE.py:131-177`):

  * Jaro-Winkler surface similarity — not in the reference (its string
    similarity is char-n-gram TF-IDF cosine, C1); pandas UDF, with Spark's
    built-in ``levenshtein`` available as a cross-check column.
  * TF-IDF cosine — computed relationally in ``blocking.cosine_topk``.
  * bi-encoder embedding dot product — the reference's dual-encoder score
    (`/root/reference/modeling_DualEncoder.py:44-66`,
    `/root/reference/modeling_E2E_exhaustive.py:147-173`); here a batched
    ``np.einsum`` over Arrow record batches. Test embeddings are
    deterministic hashed char-n-gram vectors (FIXTURES.md §7) so no model
    weights are needed; a real encoder plugs into ``embed_udf``'s slot via
    mapInPandas iterator form.

No row-at-a-time Python UDFs anywhere (enforced by a test).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMB_DIM = 64

# ---------------------------------------------------------------------------
# Jaro-Winkler
# ---------------------------------------------------------------------------


def jaro_winkler(s1: str, s2: str, prefix_scale: float = 0.1) -> float:
    """Plain-python Jaro-Winkler (standard published formula)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    window = max(len1, len2) // 2 - 1
    if window < 0:
        window = 0
    match1 = [False] * len1
    match2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(len2, i + window + 1)
        for j in range(lo, hi):
            if not match2[j] and s2[j] == c:
                match1[i] = True
                match2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0.0
    k = 0
    for i in range(len1):
        if match1[i]:
            while not match2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 0.5
            k += 1
    jaro = (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0
    prefix = 0
    for a, b in zip(s1, s2):
        if a == b and prefix < 4:
            prefix += 1
        else:
            break
    return jaro + prefix * prefix_scale * (1.0 - jaro)


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched JW over string pairs (strings are short; the per-pair
    loop runs inside one Arrow batch, not one Python call per Spark row)."""
    return pd.Series(
        [jaro_winkler(x or "", y or "") for x, y in zip(a, b)], dtype="float64"
    )


# ---------------------------------------------------------------------------
# deterministic hashed "bi-encoder" embeddings
# ---------------------------------------------------------------------------


# gram → blake2b hash memo (r6): the 3-gram universe of real text is tiny
# (a few 10⁴ distinct grams) while the flagship embeds ~10⁵ surfaces ×
# ~40 grams each, so >99% of blake2b calls were recomputing an
# already-seen gram. Module-level (importable module ⇒ survives task
# boundaries under spark.python.worker.reuse) and size-capped like
# wordpiece._MEMO_MAX so an adversarial gram stream cannot grow it
# unboundedly. Pure memoization: embeddings are bit-identical.
_GRAM_HASH_MEMO: dict[str, int] = {}
_GRAM_HASH_MEMO_MAX = 1_000_000


def hash_embed_numpy(texts: "pd.Series | list[str]", dim: int = EMB_DIM) -> np.ndarray:
    """L2-normalized char-3-gram hashing embeddings — a pure function of the
    normalized text, so same-entity surface variants land near each other
    (FIXTURES.md §7). Stands in for the BERT encoder at test scale."""
    memo = _GRAM_HASH_MEMO
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for r, t in enumerate(texts):
        t = (t or "").lower()
        t = " ".join(t.split())
        padded = f"  {t}  "
        for i in range(len(padded) - 2):
            g = padded[i : i + 3]
            hv = memo.get(g)
            if hv is None:
                hv = int.from_bytes(
                    hashlib.blake2b(g.encode(), digest_size=8).digest(), "big"
                )
                if len(memo) < _GRAM_HASH_MEMO_MAX:
                    memo[g] = hv
            out[r, hv % dim] += 1.0 if (hv >> 63) else -1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched text → ARRAY<FLOAT> embedding (mapInPandas-style slot
    where a real model would be loaded once per executor)."""
    m = hash_embed_numpy(texts)
    return pd.Series(list(m.astype(np.float32)))


@F.pandas_udf(T.DoubleType())
def dot_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batched dot product via one einsum per Arrow batch — the engine
    analogue of torch.bmm (`/root/reference/modeling_DualEncoder.py:59`)."""
    am = np.vstack(a.to_numpy())
    bm = np.vstack(b.to_numpy())
    return pd.Series(np.einsum("ij,ij->i", am, bm))


# ---------------------------------------------------------------------------
# combined score
# ---------------------------------------------------------------------------

DEFAULT_WEIGHTS = {"jw": 0.35, "tfidf_cos": 0.3, "emb_dot": 0.35}


def score_pairs(
    pairs: DataFrame,
    text_a: str = "text_a",
    text_b: str = "text_b",
    tfidf_col: str | None = "tfidf_cos",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Attach jw, emb_dot, and the weighted combined ``score`` column.

    ``pairs`` must carry the two surface strings; if ``tfidf_col`` is absent
    the TF-IDF component weight is redistributed to the other two signals.
    """
    w = dict(weights or DEFAULT_WEIGHTS)
    out = pairs.withColumn("jw", jaro_winkler_udf(F.col(text_a), F.col(text_b)))
    # embed each DISTINCT string once, then join the vectors back — the pair
    # table repeats every surface ~topk×aliases times, so embedding per pair
    # row would redo the (expensive) hashing that many times over. The
    # distinct sides are far smaller than the pair table; AQE broadcasts the
    # alias side on its own. eqNullSafe keeps the operator null-tolerant
    # (embed_udf maps None to the empty-string vector; a plain equality join
    # would silently DROP null-text rows).
    ea = (
        pairs.select(F.col(text_a).alias("_ta")).distinct()
        .withColumn("_ea", embed_udf(F.col("_ta")))
    )
    eb = (
        pairs.select(F.col(text_b).alias("_tb")).distinct()
        .withColumn("_eb", embed_udf(F.col("_tb")))
    )
    out = (
        out.join(ea, F.col(text_a).eqNullSafe(F.col("_ta"))).drop("_ta")
        .join(eb, F.col(text_b).eqNullSafe(F.col("_tb"))).drop("_tb")
    )
    out = out.withColumn("emb_dot", dot_udf(F.col("_ea"), F.col("_eb"))).drop("_ea", "_eb")
    if tfidf_col is not None and tfidf_col in pairs.columns:
        score = (
            F.col("jw") * F.lit(w["jw"])
            + F.col(tfidf_col) * F.lit(w["tfidf_cos"])
            + F.col("emb_dot") * F.lit(w["emb_dot"])
        )
    else:
        total = w["jw"] + w["emb_dot"]
        score = (
            F.col("jw") * F.lit(w["jw"] / total * (w["jw"] + w["tfidf_cos"] + w["emb_dot"]))
            + F.col("emb_dot") * F.lit(w["emb_dot"] / total * (w["jw"] + w["tfidf_cos"] + w["emb_dot"]))
        )
    return out.withColumn("score", score)


# ---------------------------------------------------------------------------
# L3 cross-encoder rerank
# ---------------------------------------------------------------------------


def _marked_span(text: str, ms: str = "[Ms] ", me: str = " [Me]") -> str:
    """The [Ms]…[E] marked mention inside a context window, or the whole
    text when no markers are present (bare-surface inputs)."""
    i = text.find(ms)
    if i < 0:
        return text
    j = text.find(me, i + len(ms))
    if j < 0:
        return text
    return text[i + len(ms) : j]


def default_cross_scorer():
    """Deterministic stand-in for the cross-encoder: hashed-char-n-gram
    embeddings of the two texts, scored by their dot product plus a
    Jaro-Winkler term (pairwise, like the real model's joint attention over
    '[CLS] mention-context [SEP] candidate [SEP]'). When text_a is a marked
    P8/P9 context window, the JW term attends to the [Ms]…[Me] span (the
    real model's marker attention, utils_FullTransformer.py:395-470) while
    the embedding dot sees the whole window. A real
    BertForSequenceClassification head (modeling_FullTransformer.py:62-101)
    replaces this factory: load the model HERE (once per partition), score
    the batch inside the returned callable."""

    def score(text_a: pd.Series, text_b: pd.Series) -> np.ndarray:
        ea = hash_embed_numpy(text_a)
        eb = hash_embed_numpy(text_b)
        dots = np.einsum("ij,ij->i", ea, eb)
        jws = np.array(
            [
                jaro_winkler(_marked_span(x or "").lower(), (y or "").lower())
                for x, y in zip(text_a, text_b)
            ]
        )
        return 0.5 * dots + 0.5 * jws

    return score


def rerank_cross(
    pairs: DataFrame,
    id_col: str = "mention_id",
    cand_col: str = "entity_id",
    text_a: str = "context",
    text_b: str = "cand_text",
    k: int = 10,
    scorer_factory=None,
) -> DataFrame:
    """L3: cross-encoder reranking of candidate pairs
    (`/root/reference/modeling_FullTransformer.py:62-101`; pair inputs
    '[CLS] mention window [SEP] entity window [SEP]' built at
    `/root/reference/utils_FullTransformer.py:395-470`).

    ``pairs`` carries one row per (mention, candidate) with the mention's
    context window in ``text_a`` and the candidate's text in ``text_b`` —
    exactly the reference's pair construction, minus the WordPiece ids (F3
    out of scope; the scorer sees the raw strings).

    mapInPandas ITERATOR form: ``scorer_factory()`` runs once per partition
    (the model-load site — per-batch loading would reload BERT thousands of
    times), then scores whole Arrow batches. Output adds ``cross_score`` and
    ``cross_rank`` (row_number per mention, ties broken by candidate id) and
    keeps only cross_rank ≤ k. Per-mention candidate lists are small (top-k
    from the retrieval stage), so the rank window shuffles only k rows per
    mention.
    """
    from collections.abc import Iterator

    factory = scorer_factory or default_cross_scorer
    out_schema = T.StructType(
        list(pairs.schema.fields) + [T.StructField("cross_score", T.DoubleType())]
    )
    a, b = text_a, text_b

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = factory()  # once per partition == once per executor slot
        for pdf in batches:
            pdf = pdf.copy()
            pdf["cross_score"] = scorer(pdf[a], pdf[b])
            yield pdf

    scored = pairs.mapInPandas(gen, out_schema)
    w = Window.partitionBy(id_col).orderBy(F.desc("cross_score"), F.asc(cand_col))
    return (
        scored.withColumn("cross_rank", F.row_number().over(w))
        .filter(F.col("cross_rank") <= k)
    )
