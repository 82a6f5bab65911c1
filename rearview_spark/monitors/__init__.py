from rearview_spark.monitors.evaluate import evaluate_monitors
from rearview_spark.monitors.scheduler import MonitorScheduler

__all__ = ["evaluate_monitors", "MonitorScheduler"]
