from dieter___etl___monarchmoney_spark.plans.contract import apply_column_contract

__all__ = ["apply_column_contract"]
