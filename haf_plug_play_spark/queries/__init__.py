from haf_plug_play_spark.queries.canonical import CANONICAL_QUERIES, ORACLE_SQL  # noqa: F401
