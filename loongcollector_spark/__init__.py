"""loongcollector_spark — a PySpark-native parse → enrich → route → aggregate
log/transcript pipeline engine.

A from-scratch reimplementation of the *capabilities* of LoongCollector
(Alibaba iLogtail successor, reference at /root/reference) expressed as
idiomatic Spark DataFrame plans:

* the processor chain (regex/grok/JSON/delimiter/KV parsing, drop/rename/
  filter/desensitize/dictmap/...) is a registry of config-driven
  ``DataFrame -> DataFrame`` functions built from native Spark SQL
  expressions (whole-stage codegen), with vectorized pandas-on-Arrow UDFs
  only where expressions can't reach;
* routing (tag-equality router + regex first-match-wins logstore router)
  becomes boolean sink columns over ONE cached frame with N filtered
  writes (copy-minimization analog of core/collection_pipeline/route/
  Router.cpp:50-82);
* aggregation becomes event-time windowed counters;
* shardhash/salting, per-partition lineage + metrics records, and a
  checkpoint-manifest resume give the 10^12-turn posture.

Nothing is ported from the reference's C++/Go — citations in docstrings
point at the behavior being matched, not code being copied.
"""

__version__ = "0.1.0"

from loongcollector_spark.session import get_spark  # noqa: F401
from loongcollector_spark.operators import REGISTRY, build_operator  # noqa: F401
