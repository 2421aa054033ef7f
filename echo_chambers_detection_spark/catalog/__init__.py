"""Query catalog package: every implemented operator as a named
(Spark, oracle-SQL) pair — the engine's public query surface and the
driver's correctness gate.

Split by query family from the former single-file catalog.py
(VERDICT r6 #7) with the registry contract unchanged: importing this
package registers every query and applies _REGISTRY_ORDER, so
`from echo_chambers_detection_spark.catalog import QUERY_REGISTRY`
behaves exactly as before (a parity test pins the full registry
contents against the pre-split snapshot).
"""

from __future__ import annotations

from echo_chambers_detection_spark.catalog._core import (
    QUERY_REGISTRY,
    QuerySpec,
    register,
    _dec_sum,
    _t,
)

# family modules register their queries on import; order here only
# resolves import-time dependencies (oracle CTE constants) — the
# driver-visible order is applied by _ordering at the end
from echo_chambers_detection_spark.catalog import flagship  # noqa: E402,F401
from echo_chambers_detection_spark.catalog import relational  # noqa: F401
from echo_chambers_detection_spark.catalog import vector  # noqa: F401
from echo_chambers_detection_spark.catalog import metrics  # noqa: F401
from echo_chambers_detection_spark.catalog import graph  # noqa: F401
from echo_chambers_detection_spark.catalog import temporal  # noqa: F401
from echo_chambers_detection_spark.catalog import windows  # noqa: F401
from echo_chambers_detection_spark.catalog import curation  # noqa: F401
from echo_chambers_detection_spark.catalog import closers  # noqa: F401
from echo_chambers_detection_spark.catalog import vector_lsh  # noqa: F401
from echo_chambers_detection_spark.catalog import _ordering  # noqa: F401

# names tests import from the catalog module surface (pre-split API)
from echo_chambers_detection_spark.catalog.graph import _post_graph  # noqa: E402
from echo_chambers_detection_spark.catalog.vector import _emb, _query_vec  # noqa: E402

__all__ = [
    "QUERY_REGISTRY",
    "QuerySpec",
    "register",
]
