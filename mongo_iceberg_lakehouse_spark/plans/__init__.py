from .medallion import (
    gold_city_sales_report,
    run_pipeline,
    silver_transform,
)

__all__ = ["gold_city_sales_report", "run_pipeline", "silver_transform"]
