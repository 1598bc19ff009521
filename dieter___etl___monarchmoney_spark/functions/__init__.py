from dieter___etl___monarchmoney_spark.functions.money import (
    clean_currency,
    money,
    money_avg,
    money_sum,
)

__all__ = ["clean_currency", "money", "money_avg", "money_sum"]
