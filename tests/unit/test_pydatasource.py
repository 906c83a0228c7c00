"""PagedApiDataSource (lark/pydatasource.py): the distributed-pagination
contracts the hash gate can't see — fetch parallelism equals the page
count, options reach the reader, and re-registration is idempotent."""

from __future__ import annotations

from demo_data_warehouse_spark.lark.pydatasource import (
    PagedApiDataSource,
    PagedApiReader,
)


def test_one_partition_per_page():
    r = PagedApiReader({"n_pages": "7", "page_size": "3"})
    parts = r.partitions()
    assert [p.value for p in parts] == list(range(7))
    rows = [row for p in parts for row in r.read(p)]
    assert len(rows) == 21
    assert [row[0] for row in rows] == list(range(21))
    # page_id column matches the partition each row came from
    assert all(row[1] == row[0] // 3 for row in rows)


def test_register_idempotent_and_scales_partitions(spark):
    spark.dataSource.register(PagedApiDataSource)
    spark.dataSource.register(PagedApiDataSource)  # re-register: no error
    df = spark.read.format("paged_api").option("n_pages", 4).option("page_size", 5).load()
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 20
