

def test_take_to_budget_boundary_row_kept(spark):
    from pyspark.sql import functions as F

    from mongo_iceberg_lakehouse_spark.operators.sampling import take_to_budget

    df = spark.createDataFrame(
        [("a", i, 10) for i in range(5)], "source string, id int, tok int"
    )
    budgets = spark.createDataFrame([("a", 25.0)], "source string, budget double")
    kept = take_to_budget(df, "source", "tok", budgets, order_key=F.col("id"))
    # cumulative-before: 0, 10, 20, 30 ... budget 25 => rows 0,1,2 kept
    # (row 2 crosses the boundary and is kept: budget is a floor).
    assert sorted(r["id"] for r in kept.collect()) == [0, 1, 2]


def test_take_to_budget_zero_budget_keeps_nothing(spark):
    from pyspark.sql import functions as F

    from mongo_iceberg_lakehouse_spark.operators.sampling import take_to_budget

    df = spark.createDataFrame([("a", 1, 10)], "source string, id int, tok int")
    budgets = spark.createDataFrame([("a", 0.0)], "source string, budget double")
    kept = take_to_budget(df, "source", "tok", budgets, order_key=F.col("id"))
    assert kept.count() == 0
