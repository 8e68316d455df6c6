"""Source connectors — facade over map_reduce_spark.io.

Parquet/text/csv/json readers, the whole-file ``(filename, content)``
source backing the reference's mapper contract, and gated JDBC/Delta
connectors.
"""

from map_reduce_spark.io import (  # noqa: F401
    TABLES,
    load_all,
    load_table,
    read_csv,
    read_delta,
    read_jdbc,
    read_json,
    read_text,
    register_views,
    whole_text_files,
)
