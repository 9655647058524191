from queue_system_simulator_spark.sources.csv_source import (  # noqa: F401
    read_requests_csv,
    validate_required_columns,
)
from queue_system_simulator_spark.sources.generator import (  # noqa: F401
    generate_sample_requests,
)
