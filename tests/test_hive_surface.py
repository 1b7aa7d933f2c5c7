"""Hive-backed SQL surface: SerDe tables, LOAD DATA, and JVM jar UDFs.

Reference parity: PgJdbcSuite.scala:813-815 (Hive SerDe + LOAD DATA) and
:978-1101 (ADD JAR / CREATE FUNCTION ... AS 'class' USING JAR, including
a jar UDTF through LATERAL VIEW). The pyspark distribution in this
container bundles spark-hive + hive 2.3 + derby, so the surface is
exercised for real: the UDF/UDTF jars are compiled on the fly with javac
against the bundled hive-exec jar (skipped if no JDK).

build_session isolates the Derby metastore per pid, so these tests never
contend with a concurrently running server process.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import pytest

_UDF_JAVA = """
import org.apache.hadoop.hive.ql.exec.UDF;

public class BangUpper extends UDF {
    public String evaluate(String s) {
        return s == null ? null : s.toUpperCase() + "!";
    }
}
"""

_UDTF_JAVA = """
import java.util.ArrayList;
import org.apache.hadoop.hive.ql.exec.UDFArgumentException;
import org.apache.hadoop.hive.ql.metadata.HiveException;
import org.apache.hadoop.hive.ql.udf.generic.GenericUDTF;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspectorFactory;
import org.apache.hadoop.hive.serde2.objectinspector.StructObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory;

public class CommaSplit extends GenericUDTF {
    @Override
    public StructObjectInspector initialize(ObjectInspector[] args)
            throws UDFArgumentException {
        ArrayList<String> names = new ArrayList<String>();
        ArrayList<ObjectInspector> ois = new ArrayList<ObjectInspector>();
        names.add("piece");
        ois.add(PrimitiveObjectInspectorFactory.javaStringObjectInspector);
        return ObjectInspectorFactory.getStandardStructObjectInspector(names, ois);
    }

    @Override
    public void process(Object[] args) throws HiveException {
        for (String p : args[0].toString().split(",")) {
            forward(new Object[] {p});
        }
    }

    @Override
    public void close() {}
}
"""


@pytest.fixture(scope="module")
def udf_jar():
    """Compile BangUpper + CommaSplit into one jar against the bundled
    hive-exec; yields the jar path."""
    if not (shutil.which("javac") and shutil.which("jar")):
        pytest.skip("no JDK in container")
    import pyspark

    jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    import glob

    cp = glob.glob(os.path.join(jars_dir, "hive-exec-*-core.jar")) + glob.glob(
        os.path.join(jars_dir, "hive-serde-*.jar")
    )
    if len(cp) < 2:
        pytest.skip("bundled hive jars not found")
    d = tempfile.mkdtemp(prefix="pg-udf-jar")
    for name, src in (("BangUpper", _UDF_JAVA), ("CommaSplit", _UDTF_JAVA)):
        with open(os.path.join(d, f"{name}.java"), "w") as f:
            f.write(src)
    subprocess.run(
        ["javac", "-cp", ":".join(cp), "BangUpper.java", "CommaSplit.java"],
        cwd=d,
        check=True,
        capture_output=True,
    )
    subprocess.run(
        ["jar", "cf", "testudfs.jar", "BangUpper.class", "CommaSplit.class"],
        cwd=d,
        check=True,
        capture_output=True,
    )
    yield os.path.join(d, "testudfs.jar")
    shutil.rmtree(d, ignore_errors=True)


class TestHiveSerde:
    def test_stored_as_orc_roundtrip(self, spark):
        spark.sql("DROP TABLE IF EXISTS hive_orc_t")
        spark.sql("CREATE TABLE hive_orc_t (a INT, b STRING) STORED AS ORC")
        try:
            spark.sql("INSERT INTO hive_orc_t VALUES (1, 'x'), (2, 'y')")
            rows = spark.sql("SELECT * FROM hive_orc_t ORDER BY a").collect()
            assert [(r.a, r.b) for r in rows] == [(1, "x"), (2, "y")]
            # it really is a Hive SerDe table, not a datasource table
            desc = spark.sql("DESCRIBE FORMATTED hive_orc_t").collect()
            serde = [r.data_type for r in desc if r.col_name == "Serde Library"]
            assert serde and "orc" in serde[0].lower()
        finally:
            spark.sql("DROP TABLE hive_orc_t")

    def test_load_data_local_inpath(self, spark, tmp_path):
        data = tmp_path / "rows.txt"
        data.write_text("3\tz\n4\tw\n")
        spark.sql("DROP TABLE IF EXISTS hive_text_t")
        spark.sql(
            "CREATE TABLE hive_text_t (a INT, b STRING) ROW FORMAT DELIMITED "
            "FIELDS TERMINATED BY '\\t' STORED AS TEXTFILE"
        )
        try:
            spark.sql(f"LOAD DATA LOCAL INPATH '{data}' INTO TABLE hive_text_t")
            rows = spark.sql("SELECT * FROM hive_text_t ORDER BY a").collect()
            assert [(r.a, r.b) for r in rows] == [(3, "z"), (4, "w")]
        finally:
            spark.sql("DROP TABLE hive_text_t")


class TestJarFunctions:
    def test_add_jar_temporary_function(self, spark, udf_jar):
        spark.sql(f"ADD JAR '{udf_jar}'")
        spark.sql("CREATE TEMPORARY FUNCTION bang_upper AS 'BangUpper'")
        try:
            r = spark.sql("SELECT bang_upper('hi') AS r").collect()
            assert r[0].r == "HI!"
        finally:
            spark.sql("DROP TEMPORARY FUNCTION bang_upper")

    def test_create_function_using_jar(self, spark, udf_jar):
        spark.sql("DROP FUNCTION IF EXISTS p_bang_upper")
        spark.sql(f"CREATE FUNCTION p_bang_upper AS 'BangUpper' USING JAR '{udf_jar}'")
        try:
            r = spark.sql(
                "SELECT p_bang_upper(v) AS r FROM VALUES ('yo'), ('hey') AS t(v) ORDER BY r"
            ).collect()
            assert [x.r for x in r] == ["HEY!", "YO!"]
        finally:
            spark.sql("DROP FUNCTION p_bang_upper")

    def test_jar_udtf_lateral_view(self, spark, udf_jar):
        """Reference PgJdbcSuite.scala:1050-1101 — jar UDTF exploded
        through LATERAL VIEW."""
        spark.sql(f"ADD JAR '{udf_jar}'")
        spark.sql("CREATE TEMPORARY FUNCTION comma_split AS 'CommaSplit'")
        try:
            rows = spark.sql(
                "SELECT t.piece FROM (SELECT 'a,b,c' AS s) src "
                "LATERAL VIEW comma_split(s) t AS piece ORDER BY piece"
            ).collect()
            assert [r.piece for r in rows] == ["a", "b", "c"]
        finally:
            spark.sql("DROP TEMPORARY FUNCTION comma_split")

    def test_missing_class_is_graceful(self, spark, udf_jar):
        with pytest.raises(Exception) as ei:
            spark.sql("CREATE TEMPORARY FUNCTION nope AS 'does.not.Exist'")
        assert "Exist" in str(ei.value)
