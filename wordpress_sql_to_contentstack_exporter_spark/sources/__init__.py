from .catalog import Catalog, jdbc_table, parquet_table
from .idlist import read_id_list

__all__ = ["Catalog", "jdbc_table", "parquet_table", "read_id_list"]
