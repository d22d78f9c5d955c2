from haf_plug_play_spark.operators.temporal import asof_join, sessionize  # noqa: F401
