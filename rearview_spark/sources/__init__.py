from rearview_spark.sources.loader import Tables, load_table, load_tables, events_as_timeseries

__all__ = ["Tables", "load_table", "load_tables", "events_as_timeseries"]
