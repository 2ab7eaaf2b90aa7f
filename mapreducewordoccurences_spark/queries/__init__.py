"""Query catalog package: every operator surface exposed as a named
(spark, sf_dir) -> DataFrame query with a matching ANSI-SQL DuckDB
oracle where SQL can express the semantics.

Formerly one 10k-line queries.py module; split by family in round 7.
The public contract is unchanged: ``QUERIES`` maps name -> callable,
``ORACLES`` maps name -> SQL string, and importing this package
registers every catalog entry (each family module registers on
import). Cross-engine determinism conventions are documented in
``_shared`` (decimal/fixed-point sums, total window orders, int/int
ratios, epoch-microsecond time arithmetic).
"""

from mapreducewordoccurences_spark.queries._shared import (  # noqa: F401
    ORACLES,
    QUERIES,
    QueryFn,
    register,
)

# importing a family module registers its queries; order only affects
# dict iteration order, never semantics (consumers key by name)
from mapreducewordoccurences_spark.queries import (  # noqa: E402, F401
    relational,
    events,
    scalarfns,
    stats,
    textops,
    dedup,
    ann,
    drift,
    graph,
    media,
    sampling,
    streaming,
)
