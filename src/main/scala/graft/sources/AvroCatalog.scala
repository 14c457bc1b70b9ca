package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** SQL addressability for graft-avro (r18): a warehouse-backed
  * [[TableCatalog]] so `CREATE TABLE`, `INSERT INTO`, `SELECT`, and
  * `DELETE FROM` resolve through plain SQL —
  *
  * {{{
  * spark.sql.catalog.graft           = graft.sources.AvroCatalog
  * spark.sql.catalog.graft.warehouse = /data/graft
  *
  * CREATE TABLE graft.db.docs (doc_id BIGINT, n_chars BIGINT,
  *   lang STRING) PARTITIONED BY (lang);
  * INSERT INTO graft.db.docs SELECT ...;
  * DELETE FROM graft.db.docs WHERE n_chars < 100;  -- the r18 COW tier
  * }}}
  *
  * Layout: a table named `graft.a.b.t` lives at `<warehouse>/a/b/t`,
  * namespaces are directories, the partition spec is the source's own
  * `_graft_partitions.json`, and an explicit `_graft_schema.json`
  * marker (written at CREATE) resolves the schema while the table is
  * still empty — with files present it must AGREE with them, and reads
  * of tables created by the path API (no marker) infer from the
  * containers exactly as before. The catalog is metadata-thin by
  * design: every byte of table state lives in the directory, so a
  * table is equally readable through the path API and survives any
  * catalog re-configuration — the same externalizable-state discipline
  * as the index artifacts.
  *
  * Partition columns: SQL declarations keep the source's contract that
  * path-borne columns come LAST in the schema; CREATE enforces it
  * loudly rather than silently reordering what the user declared.
  */
class AvroCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: Path = _
  private def conf = AvroSink.driverConf()
  private def fs = warehouse.getFileSystem(conf)

  override def name(): String = catalogName

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
    warehouse = new Path(wh)
  }

  private def pathOf(parts: Seq[String]): Path = {
    parts.foreach { p =>
      require(p.nonEmpty && !p.contains("/") && !p.contains("\\") &&
        p != "." && p != "..",
        s"graft catalog: illegal name component '$p'")
    }
    parts.foldLeft(warehouse)((acc, p) => new Path(acc, p))
  }
  private def tablePath(ident: Identifier): Path =
    pathOf(ident.namespace.toSeq :+ ident.name)

  private val SchemaMarker = "_graft_schema.json"

  /** Is this directory a TABLE (vs a namespace)? A table carries the
    * CREATE-time schema marker, a committed partition spec, or direct
    * `*.avro` children (a flat path-API table adopted into the
    * catalog). Deliberately NON-recursive: a namespace whose child
    * tables hold containers must not itself read as a table.
    */
  private def isTableDir(dir: Path): Boolean =
    fs.exists(new Path(dir, SchemaMarker)) ||
      fs.exists(new Path(dir, AvroPartitions.SpecFile)) ||
      (fs.exists(dir) && fs.listStatus(dir).exists(st =>
        st.isFile && st.getPath.getName.endsWith(".avro")))

  // -- tables -----------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = pathOf(namespace.toSeq)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(
      name() +: namespace)
    fs.listStatus(dir).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => isTableDir(new Path(dir, n)))
      .sorted
      .map(n => Identifier.of(namespace, n))
  }

  override def tableExists(ident: Identifier): Boolean = {
    val dir = tablePath(ident)
    fs.exists(dir) && isTableDir(dir)
  }

  override def loadTable(ident: Identifier): Table =
    loadTableAt(ident, asOf = None)

  /** SQL time travel (r19): `SELECT ... FROM cat.ns.t VERSION AS OF n`
    * resolves the manifest-log snapshot n of a VERSIONED table.
    */
  override def loadTable(ident: Identifier, version: String): Table =
    loadTableAt(ident, asOf = Some(version.toLong))

  /** `TIMESTAMP AS OF t` (r19): the newest committed version whose
    * manifest timestamp is at or before `timestamp` (Spark passes
    * MICROseconds; manifests record commit-time millis). A timestamp
    * before the first commit fails loudly — there is no snapshot to
    * serve.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val dir = tablePath(ident)
    if (!tableExists(ident))
      throw new NoSuchTableException((ident.namespace.toSeq :+ ident.name))
    val cutMs = timestamp / 1000L
    val spark = org.apache.spark.sql.SparkSession.active
    val v = AvroVersions.history(spark, dir.toString)
      .where(org.apache.spark.sql.functions.col("ts") <= cutMs)
      .select("version").collect().map(_.getLong(0))
      .sorted.lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"graft catalog: no committed version of $ident at or before " +
            s"timestamp ${cutMs}ms"))
    loadTableAt(ident, asOf = Some(v))
  }

  private def loadTableAt(ident: Identifier, asOf: Option[Long]): Table = {
    val dir = tablePath(ident)
    if (!tableExists(ident))
      throw new NoSuchTableException((ident.namespace.toSeq :+ ident.name))
    val pathStr = dir.toString
    // versioned tables (r19) resolve their file set from the manifest
    // log; VERSION AS OF pins an older manifest (throws on unversioned)
    def filesOf(): Seq[(String, Long)] =
      AvroVersions.resolveFiles(pathStr, conf, asOf)
        .getOrElse(AvroDsv2.listFiles(pathStr, conf))
    val partSpec = AvroPartitions.readSpec(pathStr, conf)
    val marker = new Path(dir, SchemaMarker)
    val dataFields: StructType =
      if (fs.exists(marker)) {
        val in = fs.open(marker)
        val json = try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
        org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[StructType]
      } else {
        // path-API table adopted into the catalog: infer from containers
        val props = new java.util.HashMap[String, String]()
        props.put("path", pathStr)
        return new AvroTable(
          new AvroDataSourceV2().inferSchema(
            new CaseInsensitiveStringMap(props)),
          pathStr, filesOf(), 32L << 20, partSpec,
          mayReportOrdering = asOf.isEmpty)
      }
    val partFields = partSpec.map { case (n, t) =>
      org.apache.spark.sql.types.StructField(n, AvroSink.typeOf(t),
        nullable = true)
    }
    new AvroTable(StructType(dataFields.fields ++ partFields), pathStr,
      filesOf(), 32L << 20, partSpec, mayReportOrdering = asOf.isEmpty)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String]): Table = {
    if (tableExists(ident))
      throw new TableAlreadyExistsException((ident.namespace.toSeq :+ ident.name))
    AvroSink.validateSchema(schema)
    val partCols: Seq[String] = partitions.toSeq.map { t =>
      if (t.name == "identity" && t.references.length == 1 &&
          t.references.head.fieldNames.length == 1)
        t.references.head.fieldNames.head
      else throw new UnsupportedOperationException(
        s"graft catalog: only identity partition transforms are " +
          s"supported, got $t")
    }
    val partSpec = partCols.map { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"partition column '$c' not in schema"))
      require(AvroPartitions.AllowedTypes.contains(f.dataType.typeName),
        s"partition column '$c' must be long/int/string/boolean, " +
          s"got ${f.dataType}")
      (c, f.dataType.typeName)
    }
    // the source's layout contract: path-borne columns come LAST on
    // read — a declaration that interleaves them would silently reorder
    // the user's columns, so refuse instead
    val dataFields = schema.fields.filterNot(f => partCols.contains(f.name))
    require(schema.fields.map(_.name).toSeq ==
      (dataFields.map(_.name).toSeq ++ partCols),
      s"graft catalog: partition columns must be declared LAST " +
        s"(got ${schema.fields.map(_.name).mkString(", ")}; " +
        s"partitioned by ${partCols.mkString(", ")})")
    val dir = tablePath(ident)
    fs.mkdirs(dir)
    if (partSpec.nonEmpty)
      AvroPartitions.writeSpec(dir.toString, conf, partSpec)
    // marker written ATOMICALLY (temp + rename): tableExists keys off
    // it, so a torn marker would make the table simultaneously
    // un-creatable and un-loadable (r18 review)
    val mTmp = new Path(dir, s".$SchemaMarker.tmp")
    val out = fs.create(mTmp, true)
    try out.write(StructType(dataFields).json.getBytes(
      java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    require(fs.rename(mTmp, new Path(dir, SchemaMarker)),
      s"graft catalog: schema marker rename failed for $ident")
    // TBLPROPERTIES('versioned'='true') (r19): start the table on the
    // manifest log from birth — snapshot/time-travel/fenced commits
    if (Option(properties.get("versioned")).exists(_.toBoolean))
      AvroVersions.enable(dir.toString, conf)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER TABLE is not supported")

  override def dropTable(ident: Identifier): Boolean =
    tableExists(ident) && fs.delete(tablePath(ident), true)

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent))
      throw new NoSuchTableException((oldIdent.namespace.toSeq :+ oldIdent.name))
    if (tableExists(newIdent))
      throw new TableAlreadyExistsException((newIdent.namespace.toSeq :+ newIdent.name))
    fs.mkdirs(tablePath(newIdent).getParent)
    require(fs.rename(tablePath(oldIdent), tablePath(newIdent)),
      s"graft catalog: rename $oldIdent -> $newIdent failed")
  }

  // -- namespaces (directories) ------------------------------------------

  override def listNamespaces(): Array[Array[String]] = {
    if (!fs.exists(warehouse)) return Array.empty
    fs.listStatus(warehouse).filter(_.isDirectory)
      .filter(st => !isTableDir(st.getPath))
      .map(st => Array(st.getPath.getName)).sortBy(_.head)
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    val dir = pathOf(namespace.toSeq)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(
      name() +: namespace)
    fs.listStatus(dir).filter(_.isDirectory)
      .filter(st => !isTableDir(st.getPath))
      .map(st => namespace :+ st.getPath.getName)
      .sortBy(_.mkString("."))
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs.exists(pathOf(namespace.toSeq))

  override def loadNamespaceMetadata(
      namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(name() +: namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new NamespaceAlreadyExistsException(name() +: namespace)
    fs.mkdirs(pathOf(namespace.toSeq))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER NAMESPACE is not supported")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val dir = pathOf(namespace.toSeq)
    if (!fs.exists(dir)) return false
    if (!cascade && fs.listStatus(dir).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis
        .NonEmptyNamespaceException(name() +: namespace)
    fs.delete(dir, true)
  }
}
