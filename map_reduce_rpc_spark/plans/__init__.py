"""The query library exposed through __spark_entry__.py.

Each module exports functions ``(spark, sf_dir) -> DataFrame`` plus a
matching ``*_ORACLES`` dict of DuckDB SQL twins.
"""
