from queue_system_simulator_spark.plans.registry import (  # noqa: F401
    QUERIES,
    QuerySpec,
    all_queries,
    all_oracles,
)

# importing these modules populates the registry
from queue_system_simulator_spark.plans import (  # noqa: F401,E402
    analytics_queries,
    reference_queries,
    tpch_queries,
    llm_queries,
    multimodal_queries,
    relational_queries,
    kernel_queries,
    streaming_queries,
)
