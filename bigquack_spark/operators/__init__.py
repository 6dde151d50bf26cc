"""Extension operators (SURVEY §2.9): the LLM-data-pipeline surface.

Every operator is a pure ``DataFrame -> DataFrame`` function built from JVM
built-ins (no row-at-a-time Python in any hot path) so it composes, pushes
down, and scales by shuffle — the 100 TB design mandate.
"""

from bigquack_spark.operators import (  # noqa: F401
    corpus,
    dedup,
    graph,
    joins,
    maintenance,
    multimodal,
    reconcile,
    simsearch,
    text,
)
