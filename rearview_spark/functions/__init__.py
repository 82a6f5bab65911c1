from rearview_spark.functions.graphite import compile_target, evaluate_target

__all__ = ["compile_target", "evaluate_target"]
