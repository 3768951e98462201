from tip_tpu.metrics.ranking import grouped_ranking_metrics, macro_average

__all__ = ["grouped_ranking_metrics", "macro_average"]
