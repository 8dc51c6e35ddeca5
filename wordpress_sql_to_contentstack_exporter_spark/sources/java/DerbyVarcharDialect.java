// Derby JDBC dialect with StringType -> VARCHAR instead of Spark's CLOB.
//
// Spark's built-in DerbyDialect maps Catalyst StringType to CLOB, which
// breaks two things on a live Derby database:
//
//  1. Writes of NULL strings: JdbcUtils calls setNull(i, Types.CLOB);
//     if the target column is VARCHAR (as in any real schema, e.g. the
//     WordPress DDL this engine exports from: wp_posts.post_status
//     VARCHAR(20), ...) Derby raises ERROR 22005 ("get a data value of
//     type 'VARCHAR' from ... 'CLOB'").
//  2. Filter pushdown: Derby cannot compare CLOBs, so a pushed string
//     equality predicate on a CLOB column errors server-side.
//
// Subclassing the built-in dialect keeps every other Derby mapping
// (SMALLINT for bytes, REAL handling, limit clause, error
// classification) and overrides only the string mapping. VARCHAR(32672)
// is Derby's maximum VARCHAR width. Registered ahead of the built-in
// dialect by sources/derby.py (JdbcDialects.registerDialect prepends,
// first canHandle match wins).
//
// Compiled at runtime by wordpress_sql_to_contentstack_exporter_spark/sources/derby.py
// against the installed pyspark jars; no build step in the repo.

import org.apache.spark.sql.jdbc.DerbyDialect;
import org.apache.spark.sql.jdbc.JdbcType;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.StringType;
import scala.Option;

public class DerbyVarcharDialect extends DerbyDialect {
    @Override
    public Option<JdbcType> getJDBCType(DataType dt) {
        if (dt instanceof StringType) {
            return Option.apply(new JdbcType("VARCHAR(32672)", java.sql.Types.VARCHAR));
        }
        return super.getJDBCType(dt);
    }
}
