package graft.pipeline

import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Dialect-level parity for the live MySQL→PostgreSQL path the reference
  * runs (`/root/reference/util.py:113-129` source, `:192-223` target).
  * No MySQL/PG server exists in this sandbox, so this pins the GENERATED
  * SQL instead: identifier quoting, the batched INSERT statement shape
  * (util.py:213-223 builds `INSERT INTO "t" ("c", ...) VALUES (%s, ...)`
  * — psycopg2 placeholders where JDBC uses `?`), and the DDL type mapping
  * for the retail_db column types (reference README.md:215-250: INT,
  * VARCHAR, DATETIME, DECIMAL money columns). The Derby-backed
  * JdbcConnectorSpec covers live execution; this covers what changes per
  * dialect. */
class JdbcDialectSpec extends AnyFunSuite {

  private val MysqlUrl = "jdbc:mysql://source-host:3306/retail_db"
  private val PgUrl = "jdbc:postgresql://target-host:5432/retail_dw"
  private val mysql = JdbcDialects.get(MysqlUrl)
  private val pg = JdbcDialects.get(PgUrl)

  /** retail_db `orders` as Catalyst types (order_date is DATETIME at the
    * MySQL source; order_status VARCHAR(45)). */
  private val ordersSchema = StructType(Seq(
    StructField("order_id", IntegerType),
    StructField("order_date", TimestampType),
    StructField("order_customer_id", IntegerType),
    StructField("order_status", StringType)))

  /** retail_db `order_items` money columns (DECIMAL in the dump). */
  private val moneySchema = StructType(Seq(
    StructField("order_item_id", IntegerType),
    StructField("order_item_subtotal", DecimalType(10, 2)),
    StructField("order_item_product_price", DecimalType(10, 2))))

  test("URL → dialect resolution and identifier quoting (backticks vs double quotes)") {
    assert(mysql.quoteIdentifier("order_date") == "`order_date`")
    assert(pg.quoteIdentifier("order_date") == "\"order_date\"")
    // Reserved words / mixed case survive quoting unchanged.
    assert(pg.quoteIdentifier("Order") == "\"Order\"")
  }

  test("generated INSERT matches the reference's quoted-column shape (R3)") {
    // util.py:213-223: INSERT INTO "orders" ("order_id", ...) VALUES (%s, ...)
    // JDBC uses ? placeholders; column quoting and order must match.
    val pgInsert = JdbcUtils.getInsertStatement(
      "orders", ordersSchema, None, isCaseSensitive = false, pg)
    assert(pgInsert ==
      """INSERT INTO orders ("order_id","order_date","order_customer_id","order_status") VALUES (?,?,?,?)""",
      pgInsert)
    val myInsert = JdbcUtils.getInsertStatement(
      "orders", ordersSchema, None, isCaseSensitive = false, mysql)
    assert(myInsert ==
      "INSERT INTO orders (`order_id`,`order_date`,`order_customer_id`,`order_status`) VALUES (?,?,?,?)",
      myInsert)
  }

  test("INSERT against an existing target resolves case-insensitively (full→delta parity)") {
    // When the target table already exists (every delta run after the full
    // load), Spark maps RDD columns onto the TARGET schema's names — an
    // upper-cased source column must still land in the target's column.
    val shouted = StructType(ordersSchema.map(f => f.copy(name = f.name.toUpperCase)))
    val insert = JdbcUtils.getInsertStatement(
      "orders", shouted, Some(ordersSchema), isCaseSensitive = false, pg)
    assert(insert.contains("\"order_id\"") && !insert.contains("ORDER_ID"), insert)
  }

  test("DDL type mapping for retail_db column types, per dialect (R1 create path)") {
    val pgDdl = JdbcUtils.schemaString(pg, ordersSchema, caseSensitive = false, None)
    val myDdl = JdbcUtils.schemaString(mysql, ordersSchema, caseSensitive = false, None)
    // INT survives as INTEGER on both.
    assert(pgDdl.contains("\"order_id\" INTEGER"), pgDdl)
    assert(myDdl.contains("`order_id` INTEGER"), myDdl)
    // VARCHAR source columns become the dialect's unbounded text type.
    assert(pgDdl.contains("\"order_status\" TEXT"), pgDdl)
    assert(myDdl.contains("`order_status` LONGTEXT"), myDdl)
    // DATETIME → TIMESTAMP on both (session-timezone semantics).
    assert(pgDdl.contains("\"order_date\" TIMESTAMP"), pgDdl)
    assert(myDdl.contains("`order_date` TIMESTAMP"), myDdl)
    // Money columns keep exact fixed-point precision — never a float.
    // Postgres spells it NUMERIC, MySQL DECIMAL (same SQL-standard type).
    val pgMoney = JdbcUtils.schemaString(pg, moneySchema, caseSensitive = false, None)
    val myMoney = JdbcUtils.schemaString(mysql, moneySchema, caseSensitive = false, None)
    assert(pgMoney.contains("\"order_item_subtotal\" NUMERIC(10,2)"), pgMoney)
    assert(myMoney.contains("`order_item_subtotal` DECIMAL(10,2)"), myMoney)
  }

  test("partitioned-scan bounds probe quotes the column per dialect (R2 parity)") {
    val my = Connectors.JdbcSource(MysqlUrl, partitionColumn = Some("order_id"))
    assert(my.boundsQuery("orders", "order_id") ==
      "SELECT MIN(`order_id`) lo, MAX(`order_id`) hi FROM orders")
    val p = Connectors.JdbcSource(PgUrl, partitionColumn = Some("order_id"))
    assert(p.boundsQuery("orders", "order_id") ==
      "SELECT MIN(\"order_id\") lo, MAX(\"order_id\") hi FROM orders")
  }
}
