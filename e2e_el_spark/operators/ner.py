"""Sequence decoding operators (SURVEY.md §2.9 N3): CRF Viterbi decode as
``applyInPandas`` — numpy dynamic programming per document, Arrow-batched.

The reference's CRF layer (`/root/reference/modeling_crf_ner.py:82-124`)
decodes the best BIO path from per-token emission scores plus a learned
transition matrix. Inference-time semantics only: given (doc_id, pos,
emission scores per tag) rows and a transition matrix, emit the argmax path.
The inherently-sequential scan runs vectorized inside one pandas group per
document (SURVEY.md §2.9 N3 mapping).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def viterbi_decode_np(emissions: np.ndarray, transitions: np.ndarray,
                      start: np.ndarray | None = None) -> list[int]:
    """Standard Viterbi: emissions [T, K], transitions [K, K] (from→to),
    optional start scores [K]. Returns best tag index per position."""
    T, K = emissions.shape
    if T == 0:
        return []
    score = emissions[0] + (start if start is not None else 0.0)
    back = np.zeros((T, K), dtype=np.int64)
    for t in range(1, T):
        cand = score[:, None] + transitions  # [from, to]
        back[t] = np.argmax(cand, axis=0)
        score = cand[back[t], np.arange(K)] + emissions[t]
    path = [int(np.argmax(score))]
    for t in range(T - 1, 0, -1):
        path.append(int(back[t, path[-1]]))
    return path[::-1]


def crf_viterbi(
    tokens: DataFrame, transitions: np.ndarray, tags: list[str],
    doc_col: str = "doc_id", pos_col: str = "pos", emission_cols: list[str] | None = None,
) -> DataFrame:
    """tokens(doc_id, pos, token, e_<tag>...) → (doc_id, pos, token, tag).

    One pandas group per document; numpy Viterbi inside (never per-row
    Python at the Spark boundary).
    """
    ecols = emission_cols or [f"e_{t}" for t in tags]
    trans = np.asarray(transitions, dtype=np.float64)

    def decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(pos_col)
        em = pdf[ecols].to_numpy(dtype=np.float64)
        path = viterbi_decode_np(em, trans)
        return pd.DataFrame(
            {
                doc_col: pdf[doc_col].to_numpy(),
                pos_col: pdf[pos_col].to_numpy(),
                "token": pdf["token"].to_numpy(),
                "tag": [tags[i] for i in path],
            }
        )

    out_schema = f"{doc_col} long, {pos_col} int, token string, tag string"
    return tokens.groupBy(doc_col).applyInPandas(decode, out_schema)
