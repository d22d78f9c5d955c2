from haf_plug_play_spark.plugs.framework import PLUGS, Plug, run_plug  # noqa: F401
