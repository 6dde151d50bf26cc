"""The reference's core contract, tested literally: hand the SAME SQL string
to both engines (duck.go:180,195 SetSqlQuery ≅ spark.sql) and require equal
results.  Corpus restricted to the ANSI intersection both dialects parse
verbatim."""

from __future__ import annotations

import pytest

from bigquack_spark.engine import Engine
from bigquack_spark.sources.parquet import register_views
from tests.conftest import SF_SMOKE
from tests.util import assert_frames_match

#: Statements that must parse AND agree on both engines, verbatim.
SQL_CORPUS = [
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "SELECT count(*) AS n FROM lineitem WHERE l_quantity < 10",
    "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY o_orderstatus",
    "SELECT c_name FROM customer WHERE c_acctbal BETWEEN 100 AND 500 ORDER BY c_custkey LIMIT 5",
    "SELECT n_name FROM nation WHERE n_regionkey IN (0, 1) ORDER BY n_name",
    "SELECT DISTINCT l_returnflag FROM lineitem",
    "SELECT s.s_name, n.n_name FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey ORDER BY s.s_suppkey",
    "SELECT upper(p_brand) AS b, length(p_name) AS ln FROM part ORDER BY p_partkey LIMIT 10",
    "SELECT coalesce(NULL, 'x') AS c, CASE WHEN 1 < 2 THEN 'y' ELSE 'z' END AS k",
    "SELECT l_orderkey, sum(l_quantity) AS q FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 100",
    "SELECT o_custkey AS k FROM orders INTERSECT SELECT c_custkey FROM customer",
    "SELECT avg(s_acctbal) AS a, min(s_acctbal) AS mn, max(s_acctbal) AS mx FROM supplier",
]


@pytest.fixture(scope="module")
def sql_engine(spark):
    register_views(spark, SF_SMOKE)
    return Engine(spark)


@pytest.mark.parametrize("sql", SQL_CORPUS, ids=range(len(SQL_CORPUS)))
def test_same_sql_both_engines(sql_engine, duck, sql):
    spark_pdf = sql_engine.query(sql).toPandas()
    oracle_pdf = duck.execute(sql).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, sql)
