from haf_plug_play_spark.ingest.envelope import parse_custom_json, dead_letter  # noqa: F401
