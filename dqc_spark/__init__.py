"""dqc_spark — a from-scratch PySpark-native data-quality / web-text
quality-filter engine with the capabilities of
``josephmachado/data_quality_checker`` (reference, read-only at
/root/reference).

Not a port: the reference is Go + embedded DuckDB SQL (one fresh
connection + one SQL string per check, see
``/root/reference/internal/checker/checker.go``).  This engine expresses
every check as a Catalyst ``Column`` predicate over a DataFrame so that
an entire suite of checks fuses into a single scan (partial aggregation,
predicate pushdown, column pruning all come for free), and generalizes
the table-level checks into per-document keep/drop gates for web-scale
text pipelines (language ID, perplexity, heuristic rules, PII scrub).
"""

from dqc_spark.cache import release_all
from dqc_spark.checks import CheckResult, DataQualityChecker
from dqc_spark.session import get_spark
from dqc_spark.suite import Check, CheckSuite

__all__ = [
    "CheckResult",
    "DataQualityChecker",
    "get_spark",
    "Check",
    "CheckSuite",
    "release_all",
]

__version__ = "0.1.0"
