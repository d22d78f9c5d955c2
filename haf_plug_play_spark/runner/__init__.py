from haf_plug_play_spark.runner.batch import PlugRunner  # noqa: F401
from haf_plug_play_spark.runner.state import PlugStateStore  # noqa: F401
