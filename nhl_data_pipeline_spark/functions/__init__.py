from nhl_data_pipeline_spark.functions.scalars import (  # noqa: F401
    accent_fold,
    nhl_season_code,
    split_part,
    sunday_zero_dow,
)
