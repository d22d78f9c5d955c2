from haf_plug_play_spark.functions.strings import slugify  # noqa: F401
