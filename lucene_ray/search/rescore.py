"""Fork-specific scoring extras + second-phase rescoring.

- ``bayesian_score``: ``P = sigmoid(alpha * (score - beta))`` calibration
  wrapper (fork ``core/search/BayesianScoreQuery.java:17-25``).
- ``log_odds_fusion``: combine sub-query probabilities via log-odds sum
  (fork ``core/search/LogOddsFusionQuery.java:17-26`` — hybrid BM25+KNN
  fusion).
- ``rescore_topn``: re-rank the top-N candidates with a secondary scoring
  callable (fork ``core/search/RescoreTopNQuery.java:17-26``; classic
  two-phase retrieval). Operates on result dicts from
  ``IndexSearcher.search``; ties re-broken by docid like the first phase.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np

F32 = np.float32


def bayesian_score(scores: np.ndarray, alpha: float, beta: float) -> np.ndarray:
    """float32 sigmoid calibration of raw scores into probabilities."""
    s = np.asarray(scores, dtype=F32)
    return (F32(1.0) / (F32(1.0) + np.exp(-(F32(alpha) * (s - F32(beta)))))).astype(F32)


def log_odds_fusion(prob_lists: Sequence[np.ndarray], eps: float = 1e-6) -> np.ndarray:
    """Fuse aligned probability arrays by summing log-odds; inverse-sigmoid
    of the sum gives the fused probability."""
    eps64 = float(eps)
    acc = np.zeros_like(np.asarray(prob_lists[0], dtype=np.float64))
    for p in prob_lists:
        p64 = np.clip(np.asarray(p, dtype=np.float64), eps64, 1.0 - eps64)
        acc += np.log(p64 / (1.0 - p64))
    return (1.0 / (1.0 + np.exp(-acc))).astype(F32)


def rescore_topn(
    result: Dict,
    n: int,
    scorer: Callable[[List, np.ndarray], np.ndarray],
    k: int = 10,
) -> Dict:
    """Two-phase rescoring: take the first-phase top-``n`` candidates,
    compute secondary scores via ``scorer(keys, first_scores)``, and
    return the top-``k`` under (new score desc, docid asc)."""
    keys = result["keys"][:n]
    docids = np.asarray(result["docids"][:n])
    first = np.asarray(result["scores"][:n], dtype=F32)
    second = np.asarray(scorer(keys, first), dtype=F32)
    order = np.lexsort((docids, -second.astype(np.float64)))[:k]
    return {
        "docids": docids[order],
        "keys": [keys[i] for i in order],
        "scores": second[order],
        "first_scores": first[order],
        "total_hits": result["total_hits"],
        "relation": result["relation"],
    }
