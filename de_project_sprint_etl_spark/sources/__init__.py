from de_project_sprint_etl_spark.sources.readers import (  # noqa: F401
    load_testdata,
    read_csv,
    read_headerless_csv,
    read_parquet,
)
from de_project_sprint_etl_spark.sources.writers import (  # noqa: F401
    append,
    overwrite,
)
