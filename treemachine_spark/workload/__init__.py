from treemachine_spark.workload.queries import QUERIES
from treemachine_spark.workload.oracles import ORACLES

__all__ = ["QUERIES", "ORACLES"]
