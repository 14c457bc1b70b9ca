package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the r16 sidecar/layout primitives — pure JVM
  * (no SparkSession), so exhaustive-ish input sweeps are cheap.
  */
class AvroPrimitivesPropertySpec extends AnyFunSuite {

  // deterministic pseudo-random strings (no RNG: md5 chain)
  private def pseudoStrings(n: Int): Seq[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until n).map { i =>
      val h = md.digest(s"seed-$i".getBytes("UTF-8"))
      new String(h.map(b => (((b & 0xff) % 90) + 33).toChar)) // printable
    }
  }

  test("bloom: NO false negatives over inserted values; FP rate sane") {
    val words = new Array[Long](AvroBloom.Words)
    val present = pseudoStrings(300)
    present.foreach(AvroBloom.add(words, _))
    present.foreach(s => assert(AvroBloom.mayContain(words, s),
      s"false negative for inserted value: $s"))
    // absent values: most must be provably absent at this load factor
    val absent = (1000 until 2000).map(i => s"absent-$i")
    val fp = absent.count(AvroBloom.mayContain(words, _))
    assert(fp < absent.size / 2,
      s"bloom useless: $fp/${absent.size} false positives")
  }

  test("bloom: base64 round-trip is exact; malformed payloads are None") {
    val words = new Array[Long](AvroBloom.Words)
    pseudoStrings(50).foreach(AvroBloom.add(words, _))
    val back = AvroBloom.fromBase64(AvroBloom.toBase64(words))
    assert(back.isDefined && back.get.toSeq === words.toSeq)
    assert(AvroBloom.fromBase64("not base64 at all!!").isEmpty)
    assert(AvroBloom.fromBase64(
      java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2, 3))).isEmpty)
    assert(AvroBloom.fromBase64("").isEmpty)
  }

  test("bloom canonical: integral classes share a form, doubles are untracked") {
    assert(AvroBloom.canonical(java.lang.Long.valueOf(42L)) ===
      AvroBloom.canonical(java.lang.Integer.valueOf(42)))
    assert(AvroBloom.canonical(java.lang.Short.valueOf(42.toShort)) ===
      Some("42"))
    assert(AvroBloom.canonical(java.lang.Double.valueOf(42.0)).isEmpty)
    assert(AvroBloom.canonical(null).isEmpty)
    assert(AvroBloom.canonical("x=y/z").contains("x=y/z"))
  }

  test("partition values: encode/typed round-trips adversarial strings") {
    val nasty = Seq("plain", "has space", "a=b", "x/y", "c:d", "q?r",
      "per%cent", "plus+sign", "ünïcode-ağır", "trailing.", "...",
      "0", "-5", "comma,sep", "tab\tchar", "quote\"s", "__almost_null__")
    nasty.foreach { s =>
      val enc = AvroPartitions.encode(s)
      // a path segment must not contain separators or '=' ambiguity
      assert(!enc.contains("/") && !enc.contains("=") && !enc.contains("\t"),
        s"'$s' encoded to unsafe segment '$enc'")
      assert(AvroPartitions.typed(enc, "string") === s)
    }
    // typed longs/ints/booleans restore their java classes
    assert(AvroPartitions.typed(AvroPartitions.encode(
      java.lang.Long.valueOf(-77L)), "long") === java.lang.Long.valueOf(-77L))
    assert(AvroPartitions.typed(AvroPartitions.encode(
      java.lang.Integer.valueOf(12)), "integer") === java.lang.Integer.valueOf(12))
    assert(AvroPartitions.typed(AvroPartitions.encode(
      java.lang.Boolean.TRUE), "boolean") === java.lang.Boolean.TRUE)
    // the null marker types to null for every type name
    Seq("string", "long", "integer", "boolean").foreach(t =>
      assert(AvroPartitions.typed(AvroPartitions.NullMarker, t) == null))
    assert(AvroPartitions.encode(null) === AvroPartitions.NullMarker)
  }

  test("rawValuesOf parses only DECLARED partition segments, first '=' wins") {
    val vals = AvroPartitions.rawValuesOf(
      "file:/data/t/lang=en/band=a%3Db/part-00000.avro", Set("lang", "band"))
    assert(vals === Map("lang" -> "en", "band" -> "a%3Db"))
    assert(AvroPartitions.typed(vals("band"), "string") === "a=b")
    // undeclared kv segments and non-kv segments are ignored
    val sparse = AvroPartitions.rawValuesOf(
      "/x/other=zz/lang=de/file.avro", Set("lang"))
    assert(sparse === Map("lang" -> "de"))
    // '=' at position 0 is not a kv segment
    assert(AvroPartitions.rawValuesOf("/x/=weird/f.avro", Set("lang")).isEmpty)
  }
}
