"""§A33 extension injection — prove `spark.sql.extensions` passthrough
actually lands an injected rule, mirroring the reference's
ExtensionBuilderSuite.scala:74 (which asserts an injected rule appears
in the session's batches).

A Function1[SparkSessionExtensions, Unit] probe class is compiled with
javac on the fly (raw scala.Function1 — SAM-with-defaults in 2.13) and
loaded by a FRESH JVM via a subprocess: extensions resolve at session
creation from the driver classloader, so the shared pytest session
can't exercise them."""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys
import tempfile
import textwrap

import pytest

_PROBE_JAVA = """
import org.apache.spark.sql.SparkSessionExtensions;

public class ProbeExtension implements scala.Function1 {
    @SuppressWarnings("unchecked")
    public Object apply(Object extObj) {
        SparkSessionExtensions ext = (SparkSessionExtensions) extObj;
        System.setProperty("spark.graft.extension.injected", "true");
        ext.injectCheckRule(new scala.Function1() {
            public Object apply(Object session) {
                return new scala.Function1() {
                    public Object apply(Object plan) {
                        System.setProperty(
                            "spark.graft.extension.checkrule.ran", "true");
                        return scala.runtime.BoxedUnit.UNIT;
                    }
                };
            }
        });
        return scala.runtime.BoxedUnit.UNIT;
    }
}
"""


@pytest.fixture(scope="module")
def probe_class_dir():
    if not shutil.which("javac"):
        pytest.skip("no JDK in container")
    import pyspark

    jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    cp = (
        glob.glob(os.path.join(jars_dir, "spark-sql_*.jar"))
        + glob.glob(os.path.join(jars_dir, "spark-sql-api_*.jar"))
        + glob.glob(os.path.join(jars_dir, "spark-catalyst_*.jar"))
        + glob.glob(os.path.join(jars_dir, "scala-library-*.jar"))
    )
    if not cp:
        pytest.skip("spark jars not found")
    d = tempfile.mkdtemp(prefix="pg-ext-probe")
    with open(os.path.join(d, "ProbeExtension.java"), "w") as f:
        f.write(_PROBE_JAVA)
    subprocess.run(
        ["javac", "-nowarn", "-cp", ":".join(cp), "ProbeExtension.java"],
        cwd=d,
        check=True,
        capture_output=True,
    )
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_extension_rule_injected_and_applied(probe_class_dir):
    """A fresh session with spark.sql.extensions=ProbeExtension must (a)
    invoke the builder and (b) run the injected check rule during
    analysis of an ordinary query."""
    script = textwrap.dedent(
        """
        from pyspark.sql import SparkSession
        spark = (
            SparkSession.builder.master("local[2]")
            .appName("extension-probe")
            .config("spark.driver.extraClassPath", CLASSDIR)
            .config("spark.sql.extensions", "ProbeExtension")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sql("SELECT 1 AS x").collect()
        inj = spark._jvm.System.getProperty("spark.graft.extension.injected")
        ran = spark._jvm.System.getProperty("spark.graft.extension.checkrule.ran")
        print(f"INJECTED={inj} RAN={ran}")
        spark.stop()
        """
    ).replace("CLASSDIR", repr(probe_class_dir))
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "INJECTED=true" in out.stdout
    assert "RAN=true" in out.stdout
