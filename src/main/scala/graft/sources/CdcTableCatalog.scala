package graft.sources

import java.util

import graft.cdc.{BinlogFormats, CdcSchema}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 `TableCatalog` over one CDC log: pure-SQL access to every
  * table the log maps, the Spark analogue of the reference's
  * `CREATE TABLE ... ENGINE=BINLOGDB` DDL surface (SURVEY §2.A A24)
  * without per-table registration:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.cdc", classOf[CdcTableCatalog].getName)
  * spark.conf.set("spark.sql.catalog.cdc.indexFile", "/logs/mysql-bin.index")
  * spark.conf.set("spark.sql.catalog.cdc.binlogFormat", "mysql")
  * spark.sql("SHOW TABLES IN cdc.shop")
  * spark.sql("SELECT * FROM cdc.shop.orders WHERE __op = 1")
  * }}}
  *
  * Namespaces are the log's databases; `SHOW TABLES`/`SHOW NAMESPACES`
  * list from the adapter's bounded-I/O table enumeration (newest file's
  * TABLE_MAPs — one file read at any log size; complete from sidecars
  * on GCDC), while `loadTable` infers any table's schema exactly
  * (newest-first walk, early exit). The catalog is read-only: the log
  * is the producer's — create/alter/drop fail loud, same posture as
  * the source's write rejection (A22-A23). Catalog options beyond
  * `indexFile`/`binlogFormat` (e.g. `rowsQuery`) flow into every
  * loaded table as table properties; per-read options still win.
  */
class CdcTableCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var opts: CaseInsensitiveStringMap = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    require(options.get("indexFile") != null && options.get("indexFile").nonEmpty,
      s"catalog '$name': option 'spark.sql.catalog.$name.indexFile' is required")
    BinlogFormats.forName(Option(options.get("binlogFormat")).getOrElse("gcdc"))
    catalogName = name
    opts = options
  }

  override def name(): String = catalogName

  private def indexFile: String = opts.get("indexFile")
  private def adapter = BinlogFormats.forName(
    Option(opts.get("binlogFormat")).getOrElse("gcdc"))

  // ------------------------------------------------------------ namespaces

  override def listNamespaces(): Array[Array[String]] =
    adapter.listTables(indexFile).map(_._1).distinct.map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty // single-level: no children
    else throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 &&
      adapter.listTables(indexFile).exists(_._1 == namespace(0))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = readOnly("CREATE NAMESPACE")
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = readOnly("ALTER NAMESPACE")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    readOnly("DROP NAMESPACE")

  // ---------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val listed = adapter.listTables(indexFile)
    if (namespace.length != 1 || !listed.exists(_._1 == namespace(0)))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    listed.filter(_._1 == namespace(0))
      .map { case (_, t) => Identifier.of(namespace, t) }.toArray
  }

  override def loadTable(ident: Identifier): Table = {
    if (ident.namespace.length != 1) throw new NoSuchTableException(ident)
    val db = ident.namespace()(0)
    val tbl = ident.name()
    val src = adapter.inferSourceSchema(indexFile, db, tbl)
      .getOrElse(throw new NoSuchTableException(ident))
    val props = new util.HashMap[String, String]()
    opts.asCaseSensitiveMap().forEach((k, v) => props.put(k, v))
    props.put("database", db)
    props.put("table", tbl)
    val rq = opts.getBoolean("rowsQuery", false)
    new CdcTable(CdcSchema.withEnvelope(src, rowsQuery = rq), props)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    readOnly("CREATE TABLE")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly("ALTER TABLE")
  override def dropTable(ident: Identifier): Boolean = readOnly("DROP TABLE")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly("RENAME TABLE")

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"catalog '$catalogName' is a read-only view of a CDC log owned by its " +
        s"producer — $op is not supported (mutate the SOURCE database; its " +
        "changes arrive through the log)")
}
