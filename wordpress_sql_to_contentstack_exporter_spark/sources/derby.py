"""Derby JDBC dialect registration (StringType -> VARCHAR, not CLOB).

Spark's built-in Derby dialect maps ``StringType`` to CLOB, which (a)
kills writes of NULL strings into VARCHAR columns (``setNull`` with
``Types.CLOB`` -> Derby ERROR 22005) and (b) prevents pushed string
predicates (Derby cannot compare CLOBs). Real schemas — including the
WordPress DDL this engine exports from (``wp_posts.post_status
VARCHAR(20)``, ``wp_users.user_login VARCHAR(60)``, ...) — use VARCHAR,
so any Derby-backed run of the reference pipeline
(``/root/reference/libs/utils/helper.js:43-51`` is the MySQL equivalent)
hits this trap.

``ensure_derby_varchar_dialect(spark)`` compiles the one-class Java
dialect shipped at ``sources/java/DerbyVarcharDialect.java`` against the
installed pyspark jars (cached per Spark version), ships it to executors
via ``addJar`` (so task deserialization of the dialect closure resolves
the class), loads it driver-side through a URLClassLoader, and prepends
it to ``JdbcDialects``. Idempotent per JVM.

This runs automatically from ``jdbc_table`` for ``jdbc:derby:`` URLs; a
non-Derby deployment never pays the javac cost.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import tempfile

import pyspark
from pyspark.sql import SparkSession

_JAVA_SRC = os.path.join(os.path.dirname(__file__), "java", "DerbyVarcharDialect.java")
_CLASS_NAME = "DerbyVarcharDialect"

# JVM-process-level flag: JdbcDialects is global JVM state, so one
# registration per driver JVM. Keyed by the JVM's startTime via the
# gateway would be overkill — pyspark keeps one gateway per process.
_registered = False


def _find_javac() -> str:
    javac = shutil.which("javac")
    if javac:
        return javac
    java_home = os.environ.get("JAVA_HOME", "")
    candidate = os.path.join(java_home, "bin", "javac")
    if java_home and os.path.exists(candidate):
        return candidate
    raise RuntimeError(
        "javac not found (need a JDK, not just a JRE) — cannot compile the "
        "Derby VARCHAR dialect. Either install a JDK or pre-build "
        f"{_CLASS_NAME}.jar and place it on spark.driver.extraClassPath."
    )


def _dialect_jar() -> str:
    """Compile the dialect once per (source, Spark version) and cache the
    jar under the system temp dir; concurrent test workers race benignly
    (atomic rename)."""
    with open(_JAVA_SRC, "rb") as f:
        src = f.read()
    key = hashlib.sha256(src + pyspark.__version__.encode()).hexdigest()[:16]
    cache_dir = os.path.join(
        tempfile.gettempdir(), f"wordpress_sql_to_contentstack_exporter_spark-derby-dialect-{key}"
    )
    jar_path = os.path.join(cache_dir, f"{_CLASS_NAME}.jar")
    if os.path.exists(jar_path):
        return jar_path

    jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    classpath = os.pathsep.join(
        os.path.join(jars_dir, j) for j in os.listdir(jars_dir) if j.endswith(".jar")
    )
    build_dir = tempfile.mkdtemp(prefix="derby-dialect-build-")
    try:
        subprocess.run(
            [_find_javac(), "-cp", classpath, "-d", build_dir, _JAVA_SRC],
            check=True,
            capture_output=True,
            text=True,
        )
        tmp_jar = os.path.join(build_dir, f"{_CLASS_NAME}.jar")
        subprocess.run(
            ["jar", "cf", tmp_jar, "-C", build_dir, f"{_CLASS_NAME}.class"],
            check=True,
            capture_output=True,
            text=True,
        )
        os.makedirs(cache_dir, exist_ok=True)
        final = os.path.join(cache_dir, f"{_CLASS_NAME}.jar.{os.getpid()}")
        shutil.copy(tmp_jar, final)
        os.replace(final, jar_path)  # atomic vs concurrent builders
    except subprocess.CalledProcessError as e:  # surface javac's stderr
        raise RuntimeError(
            f"compiling {_JAVA_SRC} failed:\n{e.stderr}"
        ) from e
    finally:
        shutil.rmtree(build_dir, ignore_errors=True)
    return jar_path


def ensure_derby_varchar_dialect(spark: SparkSession) -> None:
    """Register the VARCHAR-mapping Derby dialect (idempotent).

    Must run before any ``jdbc:derby:`` read/write in this JVM that
    touches string columns. ``jdbc_table`` calls it automatically.
    """
    global _registered
    if _registered:
        return
    jar = _dialect_jar()
    jar_url = "file:" + jar

    sc = spark.sparkContext
    # executors deserialize the dialect instance out of the write-task
    # closure; addJar puts the class on their MutableURLClassLoader
    # (local mode included).
    sc._jsc.addJar(jar_url)

    jvm = spark._jvm
    gateway = sc._gateway
    urls = gateway.new_array(jvm.java.net.URL, 1)
    urls[0] = jvm.java.net.URI(jar_url).toURL()
    loader = jvm.java.net.URLClassLoader(
        urls, jvm.Thread.currentThread().getContextClassLoader()
    )
    dialect = loader.loadClass(_CLASS_NAME).newInstance()
    jvm.org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(dialect)
    _registered = True
