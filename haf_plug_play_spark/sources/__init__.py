from haf_plug_play_spark.sources.tables import TABLES, load_table, load_tables  # noqa: F401
