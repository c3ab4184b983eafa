"""proxyfeatureextraction_spark — a from-scratch PySpark-native
point-in-time feature-engineering engine.

Re-expresses the query and data-processing capabilities of the reference
``ttanv/ProxyFeatureExtraction`` (per-entity ordered-sequence feature
extraction, interval/as-of joins, gap-based sessionization) as idiomatic
Spark DataFrame plans over transcript tables
``(conv_id, turn_idx, role, text, tool, ts)``.

Everything here is built on the public Apache Spark / PySpark API only.
Reference behavior is cited in docstrings as ``file:line`` into the
read-only snapshot; no reference code is copied.
"""

__version__ = "0.1.0"

from proxyfeatureextraction_spark.session import get_spark  # noqa: F401
