"""Vectorized (Arrow) scalar UDFs — the fast Python path for logic the
built-in expressions can't express.

The engine's UDF matrix (reference extension point: ValueTransformer,
SURVEY.md §2.7):
- scalar, expressible     → Catalyst expressions (everywhere else)
- scalar, needs Python    → @pandas_udf here (Arrow batches, numpy)
- per-partition batch     → mapInPandas (operators/multimodal.py)
- per-group               → applyInPandas (operators/stateful_batch.py)
- per-group with state    → applyInPandasWithState (streaming/stateful.py)

`cosine_to_query` is the numpy fast path for scoring a corpus against
ONE query vector: the whole batch becomes a (n, d) matrix and the score
is a single BLAS matvec — the idiom to swap in when fold-expression
cosine (exact, oracle-matched) becomes the bottleneck. Results differ
from the sequential fold only in float summation order, so this path is
for serving/ranking, not for oracle-checked outputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def cosine_to_query_udf(query_vec: list[float]):
    """Build a pandas_udf scoring embeddings against a fixed query vector.

    The query vector is captured in the closure and shipped once per
    task (it is tiny); each Arrow batch of embeddings is stacked into a
    contiguous matrix and scored with one matvec.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf("double")
    def score(emb: pd.Series) -> pd.Series:
        if qn == 0.0:  # zero query: cosine undefined — score everything 0
            return pd.Series(np.zeros(len(emb)))
        # np.stack raises on a batch containing NULL embeddings; score
        # the non-null rows and emit NaN (→ SQL NULL) for the null ones.
        mask = emb.notna().to_numpy()
        out = np.full(len(emb), np.nan)
        if mask.any():
            m = np.stack(emb[mask].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1)
            norms[norms == 0.0] = np.inf  # zero vectors score 0, not NaN
            out[mask] = m @ q / (norms * qn)
        return pd.Series(out)

    return score


def cosine_to_query(df, query_vec: list[float], vec_col: str = "embedding") -> Column:
    return cosine_to_query_udf(query_vec)(F.col(vec_col))
