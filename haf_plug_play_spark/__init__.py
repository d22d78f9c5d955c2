"""haf_plug_play_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of imwatsi/haf-plug-play.

Brand-new Spark-first design (DataFrame / SQL / Structured Streaming), not a
port of the reference's PostgreSQL-procedure execution engine. See SURVEY.md
for the operator inventory this package implements.
"""

__version__ = "0.1.0"

from haf_plug_play_spark.session import get_spark  # noqa: F401
