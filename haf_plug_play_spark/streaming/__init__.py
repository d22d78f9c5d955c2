from haf_plug_play_spark.streaming.windowed import windowed_event_aggs  # noqa: F401
from haf_plug_play_spark.streaming.stateful import running_user_state  # noqa: F401
from haf_plug_play_spark.streaming.dedup import stream_exact_dedup  # noqa: F401
from haf_plug_play_spark.streaming.drift import (  # noqa: F401
    reference_unigram,
    windowed_surprisal_drift,
)
