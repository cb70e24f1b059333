"""Scalar function surface (SURVEY.md §2.9) with one ``register(spark)``
entry point, mirroring the reference's ``functions.register(sqlContext)``
(etl/src/main/scala/org/sparkline/etl/functions/package.scala:30-35).
"""

from audience_behavior_semantic_etl_spark.functions.datetime_fns import (  # noqa: F401
    date_parts,
    spkl_date_time,
    spkl_format_date,
)
from audience_behavior_semantic_etl_spark.functions.math_fns import calc_percent  # noqa: F401
from audience_behavior_semantic_etl_spark.functions.enrich import (  # noqa: F401
    parse_ip_udf,
    parse_user_agent_udf,
)


def register(spark) -> None:
    """Install the SQL-callable functions (UDF registry analog).

    Native Column builders (date parts, calc_percent) need no
    registration; only the two pandas-UDF enrichers are registered for
    SQL use, matching the reference registering U1-U5
    (functions/package.scala:30-35).
    """
    spark.udf.register("parse_user_agent", parse_user_agent_udf)
    spark.udf.register("parse_ip", parse_ip_udf)
