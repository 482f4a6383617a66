from datanika_core_spark.orchestration.hooks import hooks  # noqa: F401
from datanika_core_spark.orchestration.runs import (  # noqa: F401
    Run,
    RunLedger,
    RunStatus,
)
