package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import scala.jdk.CollectionConverters._

/** Small-file COMPACTION execution for graft-avro (r18) — what turns
  * [[graft.ops.Layout.compactionPlan]]'s bins into actual rewrites. The
  * streaming sink writes one container per epoch×task, so a long-lived
  * tail accumulates thousands of small files; `compact(dir, target)`
  * rewrites each bin of small containers into ONE container of
  * ≈`targetBytes`, preserving the partition layout (bins never cross a
  * `col=value` directory), regenerating sidecars (file stats + block
  * zone maps), and leaving unbinned files byte-identical.
  *
  * Bin assignment mirrors [[graft.ops.Layout.compactionPlan]] exactly —
  * files size-DESC (path tiebreak), bin = floor(cum_before /
  * targetBytes), per directory — so the executed file count equals the
  * plan's bin count (single-file bins are no-ops and stay untouched: a
  * rewrite that changes nothing but bytes-identity is pure churn).
  *
  * CRASH CONTRACT (no transaction log, deterministic-name + manifest
  * recovery — the streaming sink's discipline applied to rewrites):
  *  1. the bin's rows stream into an invisible dot-temp;
  *  2. a MANIFEST (`.graft-cmp-<digest>.manifest.json`: final name +
  *     source list; digest = md5 of the sorted source names) is written;
  *  3. the temp renames to `compact-<digest>.avro` + sidecar — THE
  *     commit point;
  *  4. the sources (+ sidecars) are deleted;
  *  5. the manifest is deleted.
  * A crash before (3) aborts on the next `compact` (manifest with no
  * final file ⇒ delete temp + manifest; sources untouched). A crash
  * after (3) leaves the compacted file AND its sources visible —
  * duplicate rows until the next `compact` runs its RECOVERY sweep,
  * which finishes (4)+(5); the manifest makes that repair exact. This
  * is the honest no-log trade: commit is atomic per bin, and the only
  * inconsistent window (post-rename, pre-delete) is repairable and
  * detectable, never silent — and since r19 it is closed for READERS
  * entirely: [[AvroDsv2.listFiles]] masks a committed manifest's
  * sources out of every listing, so the duplicates are never served
  * even before the next compact() runs the physical sweep.
  *
  * CONCURRENCY CONTRACT (r19): single writer per table for this no-log
  * protocol — a compaction racing another mutation can sweep the other
  * writer's temps. Enable the manifest log ([[AvroVersions.enable]])
  * for claim-fenced commits: a versioned compact() commits ONE fenced
  * log version (sources retained for time travel) and a concurrent
  * writer fails loudly ([[AvroVersions.ConcurrentWriteException]])
  * instead of interleaving.
  */
object AvroCompact {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** One planned bin: the directory it lives in, its source files
    * (path-sorted), and the deterministic digest naming its output.
    */
  private final case class Bin(dir: String, sources: Seq[String]) {
    def digest: String = md5Hex(sources.sorted.mkString("\n")).take(16)
    def finalName: String = s"compact-$digest.avro"
    def manifestName: String = s".graft-cmp-$digest.manifest.json"
  }

  /** Execute compaction under `dir`: recovery sweep, plan bins (per
    * partition directory, compactionPlan's next-fit-decreasing rule),
    * rewrite every multi-file bin, commit each through the manifest
    * protocol. Returns the number of bins rewritten. Idempotent: a
    * second run finds no multi-file bins (or finishes a crashed one)
    * and rewrites nothing.
    */
  def compact(dir: String, targetBytes: Long,
      blockRows: Option[Int] = None): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val conf = AvroSink.driverConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    // a VERSIONED table compacts against its manifest file set and
    // commits through the log (below) — the .graft-cmp manifest
    // protocol is the no-log table's substitute commit layer
    val versioned = AvroVersions.isVersioned(fs, root)
    if (!versioned) recover(fs, root)
    val current =
      if (versioned) AvroVersions.resolveFiles(dir, conf).get
      else AvroDsv2.listFiles(dir, conf)
    // candidacy: only files SMALLER than the target are compaction
    // input — a container already at/above target is done (rewriting it
    // into an ever-bigger monolith is pure churn, and excluding it is
    // what makes repeated compaction converge: outputs of multi-file
    // bins land at ≈≥ target and leave the candidate set)
    val bins = planBins(current.filter(_._2 < targetBytes), targetBytes)
      .filter(_.sources.size >= 2)
    if (bins.isEmpty) return 0
    // rewrite phase: dot-temps only (sources untouched); distributed one
    // bin per task when a session is active
    val written: Seq[(Bin, String, Array[Byte])] = try {
      org.apache.spark.sql.SparkSession.getActiveSession match {
        case Some(ss) if bins.size > 1 =>
          ss.sparkContext.parallelize(bins,
            math.min(bins.size, math.max(1, ss.sparkContext.defaultParallelism)))
            .map(b => (b, rewriteBin(b, blockRows)))
            .collect().toSeq.map { case (b, (t, s)) => (b, t, s) }
        case _ => bins.map { b =>
          val (t, s) = rewriteBin(b, blockRows); (b, t, s)
        }
      }
    } catch {
      case t: Throwable =>
        AvroSink.tempSweep(fs, root, ".graft-cmp-")
        throw t
    }
    // versioned commit (r19): rename every bin's output to a fresh
    // unique name (sidecar first), then swap sources for outputs in ONE
    // fenced log commit; sources stay on disk for time travel. A crash
    // before the log commit leaves only unreferenced fresh-name files
    // (expire's orphan pass reclaims them)
    if (versioned) {
      // compacted bins CONCATENATE sorted sources (no merge-sort): the
      // every-file-sorted invariant is gone — break the marker's claim
      // BEFORE any output becomes visible (r19 review)
      AvroSortMarker.clear(dir, conf)
      val opId = java.util.UUID.randomUUID().toString.take(8)
      AvroVersions.commitSwap(fs, root,
        written.map { case (bin, tempPath, stats) =>
          (tempPath, new Path(new Path(bin.dir),
            s"compact-${bin.digest}-$opId.avro").toString, stats)
        },
        written.flatMap(_._1.sources), "compact")
      return written.size
    }
    AvroSortMarker.clear(dir, conf)
    // commit phase, per bin: manifest (atomic temp+rename — a torn
    // manifest must be impossible, recovery parses it) → SIDECAR →
    // rename (= the commit point; the sidecar lands first because a
    // sidecar without its container is inert to readers, while a
    // container that crash-lost its sidecar would lose pushdown/pruning
    // FOREVER — compacted files sit at/above target and never re-enter
    // compaction) → source deletes → manifest delete
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    written.foreach { case (bin, tempPath, stats) =>
      val dirPath = new Path(bin.dir)
      val manifest = om.createObjectNode()
      manifest.put("final", bin.finalName)
      val arr = manifest.putArray("sources")
      bin.sources.foreach(arr.add)
      val mPath = new Path(dirPath, bin.manifestName)
      val mTmp = new Path(dirPath, s"${bin.manifestName}.tmp")
      val mOut = fs.create(mTmp, true)
      try mOut.write(om.writeValueAsBytes(manifest)) finally mOut.close()
      fs.delete(mPath, false)
      require(fs.rename(mTmp, mPath),
        s"graft-avro compact: manifest rename $mTmp -> $mPath failed")
      val sOut = fs.create(new Path(dirPath, s"${bin.finalName}.stats.json"), true)
      try sOut.write(stats) finally sOut.close()
      val dst = new Path(dirPath, bin.finalName)
      require(fs.rename(new Path(tempPath), dst),
        s"graft-avro compact: rename $tempPath -> $dst failed")
      bin.sources.foreach { s =>
        fs.delete(new Path(s), false)
        fs.delete(new Path(s"$s.stats.json"), false)
      }
      fs.delete(mPath, false)
    }
    written.size
  }

  /** Recovery sweep (see class doc): finish or abort every bin whose
    * manifest survived a crash.
    */
  private def recover(fs: org.apache.hadoop.fs.FileSystem, root: Path): Unit = {
    if (!fs.exists(root)) return
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val it = fs.listFiles(root, true)
    val manifests = Seq.newBuilder[Path]
    val manifestTemps = Seq.newBuilder[Path]
    while (it.hasNext) {
      val st = it.next()
      val n = st.getPath.getName
      if (n.startsWith(".graft-cmp-") && n.endsWith(".manifest.json"))
        manifests += st.getPath
      else if (n.startsWith(".graft-cmp-") && n.endsWith(".manifest.json.tmp"))
        manifestTemps += st.getPath // torn pre-commit write: plain abort
    }
    manifestTemps.result().foreach(p => fs.delete(p, false))
    manifests.result().foreach { m =>
      val dirPath = m.getParent
      // the digest is in the NAME, so the final path is derivable even
      // from an unreadable manifest (committed manifests are written
      // atomically, but a foreign/hand-torn file must not brick every
      // later compact() — the r18 review's repair-contract finding)
      val digest = m.getName.stripPrefix(".graft-cmp-")
        .stripSuffix(".manifest.json")
      val finalPath = new Path(dirPath, s"compact-$digest.avro")
      val node = try {
        val in = fs.open(m)
        try Some(om.readTree(in: java.io.InputStream)) finally in.close()
      } catch { case _: Throwable => None }
      if (fs.exists(finalPath)) {
        // crashed AFTER the commit point: finish the source deletes —
        // this needs the source list, so an unreadable manifest here
        // (impossible under the atomic-write protocol) fails LOUDLY
        // rather than leaving silent duplicates
        val sources = node.flatMap(n => Option(n.get("sources"))).getOrElse(
          throw new IllegalStateException(
            s"graft-avro compact: unreadable committed manifest $m — " +
              s"cannot determine which sources to retire (duplicates " +
              s"visible until resolved)"))
        sources.asScala.foreach { s =>
          fs.delete(new Path(s.asText), false)
          fs.delete(new Path(s"${s.asText}.stats.json"), false)
        }
      } else {
        // crashed BEFORE: abort — also retire the orphan sidecar the
        // commit may have written ahead of the rename
        fs.delete(new Path(dirPath, s"compact-$digest.avro.stats.json"), false)
      }
      fs.delete(m, false)
    }
    AvroSink.tempSweep(fs, root, ".graft-cmp-")
  }

  /** compactionPlan's assignment, driver-side over the metadata-scale
    * listing: per directory, size DESC (path tiebreak), bin =
    * floor(cumulative-bytes-before / target).
    */
  private def planBins(files: Seq[(String, Long)],
      targetBytes: Long): Seq[Bin] =
    files.groupBy(f => new Path(f._1).getParent.toString).toSeq
      .sortBy(_._1)
      .flatMap { case (d, fs0) =>
        val ordered = fs0.sortBy { case (p, len) => (-len, p) }
        var cum = 0L
        val binned = ordered.map { case (p, len) =>
          val b = cum / targetBytes
          cum += len
          (b, p)
        }
        binned.groupBy(_._1).toSeq.sortBy(_._1)
          .map { case (_, ps) => Bin(d, ps.map(_._2).sorted) }
      }

  /** Rewrite one bin into a dot-temp: union the sources' header schemas
    * by name (type conflicts fail loudly — the mergeschema contract),
    * stream every source's records in path order, null-fill absent
    * columns, regenerate stats. Returns (tempPath, sidecarBytes).
    */
  private def rewriteBin(bin: Bin,
      blockRowsOpt: Option[Int]): (String, Array[Byte]) = {
    // preserve the bin's original block granularity (r18 ADVICE): every
    // source's sidecar blocks reveal its write-time graft.blockrows —
    // take the max across sources (identical for a uniformly-written
    // table; the max is the coarsest tuned setting, never the default)
    val blockRows = blockRowsOpt.getOrElse {
      val inferred = bin.sources.flatMap(p =>
        AvroStats.read(p).map(_.blocks).filter(_.nonEmpty)
          .map(bs => math.max(1L, bs.map(_.rows).max).toInt))
      if (inferred.isEmpty) AvroSink.DefaultBlockRows else inferred.max
    }
    // merged schema across the bin (usually identical = first file's)
    val merged = scala.collection.mutable.LinkedHashMap.empty[String, Schema]
    bin.sources.foreach { p =>
      val r = new DataFileReader[GenericRecord](
        AvroDsv2.openSeekable(p), new GenericDatumReader[GenericRecord]())
      try r.getSchema.getFields.asScala.foreach { f =>
        merged.get(f.name) match {
          case None => merged(f.name) = f.schema
          case Some(prev) =>
            if (AvroDsv2.sparkTypeOf(prev) != AvroDsv2.sparkTypeOf(f.schema))
              throw new IllegalArgumentException(
                s"graft-avro compact: column '${f.name}' type conflict " +
                  s"within bin (${bin.sources.mkString(", ")})")
        }
      } finally r.close()
    }
    val fieldMeta = merged.toSeq.map { case (n, s) =>
      (n, AvroDsv2.sparkTypeOf(s).typeName)
    }
    val outSchema = AvroSink.avroSchemaOf(fieldMeta)
    val temp = new Path(bin.dir,
      s".graft-cmp-${bin.digest}.avro.tmp")
    val out = new AvroRewrite.ContainerOut(outSchema, fieldMeta, temp, blockRows)
    try {
      bin.sources.foreach { p =>
        val in = new DataFileReader[GenericRecord](
          AvroDsv2.openSeekable(p), new GenericDatumReader[GenericRecord]())
        try {
          val inSchema = in.getSchema
          // out position j <- in position (or -1 = null-fill)
          val posMap: Array[Int] = fieldMeta.map { case (n, _) =>
            Option(inSchema.getField(n)).map(_.pos()).getOrElse(-1)
          }.toArray
          val identity = posMap.length == inSchema.getFields.size() &&
            posMap.indices.forall(j => posMap(j) == j)
          var rec: GenericRecord = null
          while (in.hasNext) {
            rec = in.next(rec)
            if (identity) out.append(rec)
            else {
              val r2 = new GenericData.Record(outSchema)
              var j = 0
              while (j < posMap.length) {
                if (posMap(j) >= 0) r2.put(j, rec.get(posMap(j)))
                j += 1
              }
              out.append(r2)
            }
          }
        } finally in.close()
      }
    } catch { case t: Throwable => out.abort(); throw t }
    (temp.toString, out.finish())
  }
}
