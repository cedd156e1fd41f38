package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TarShards}
import graft.functions.TarCodec

/** ustar tar shard codec + shard assembly: byte-level conformance, python-
  * tarfile read interop (embedded fixture), round-trips, shard sizing, and
  * the real-file sink/source. */
class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  /** Built by python tarfile (USTAR_FORMAT, mtime 0): 0001.txt "hello tar
    * world", 0001.json, img/0002.bin (768 bytes of 0..255 x3); trailing
    * zero blocks trimmed to one. */
  private val pyFixtureB64: String =
      "MDAwMS50eHQAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAADAwMDA2NDQAMDAwMDAwMAAwMDAwMDAwADAwMDAwMDAw" +
      "MDE3ADAwMDAwMDAwMDAwADAwNzA2NAAgMAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAB1c3RhcgAw" +
      "MAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAABoZWxsbyB0YXIgd29ybGQA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAADAwMDEuanNvbgAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAwMDAwNjQ0ADAwMDAwMDAAMDAwMDAwMAAwMDAwMDAwMDAxMAAwMDAwMDAwMDAwMAAwMDcyMDcAIDAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAdXN0YXIAMDAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAeyJrIjogMX0AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AABpbWcvMDAwMi5iaW4AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAMDAwMDY0NAAwMDAwMDAwADAwMDAwMDAAMDAwMDAw" +
      "MDE0MDAAMDAwMDAwMDAwMDAAMDA3NTY3ACAwAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAHVzdGFy" +
      "ADAwAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAABAgMEBQYHCAkKCwwN" +
      "Dg8QERITFBUWFxgZGhscHR4fICEiIyQlJicoKSorLC0uLzAxMjM0NTY3ODk6Ozw9Pj9AQUJDREVGR0hJSktMTU5P" +
      "UFFSU1RVVldYWVpbXF1eX2BhYmNkZWZnaGlqa2xtbm9wcXJzdHV2d3h5ent8fX5/gIGCg4SFhoeIiYqLjI2Oj5CR" +
      "kpOUlZaXmJmam5ydnp+goaKjpKWmp6ipqqusra6vsLGys7S1tre4ubq7vL2+v8DBwsPExcbHyMnKy8zNzs/Q0dLT" +
      "1NXW19jZ2tvc3d7f4OHi4+Tl5ufo6err7O3u7/Dx8vP09fb3+Pn6+/z9/v8AAQIDBAUGBwgJCgsMDQ4PEBESExQV" +
      "FhcYGRobHB0eHyAhIiMkJSYnKCkqKywtLi8wMTIzNDU2Nzg5Ojs8PT4/QEFCQ0RFRkdISUpLTE1OT1BRUlNUVVZX" +
      "WFlaW1xdXl9gYWJjZGVmZ2hpamtsbW5vcHFyc3R1dnd4eXp7fH1+f4CBgoOEhYaHiImKi4yNjo+QkZKTlJWWl5iZ" +
      "mpucnZ6foKGio6SlpqeoqaqrrK2ur7CxsrO0tba3uLm6u7y9vr/AwcLDxMXGx8jJysvMzc7P0NHS09TV1tfY2drb" +
      "3N3e3+Dh4uPk5ebn6Onq6+zt7u/w8fLz9PX29/j5+vv8/f7/AAECAwQFBgcICQoLDA0ODxAREhMUFRYXGBkaGxwd" +
      "Hh8gISIjJCUmJygpKissLS4vMDEyMzQ1Njc4OTo7PD0+P0BBQkNERUZHSElKS0xNTk9QUVJTVFVWV1hZWltcXV5f" +
      "YGFiY2RlZmdoaWprbG1ub3BxcnN0dXZ3eHl6e3x9fn+AgYKDhIWGh4iJiouMjY6PkJGSk5SVlpeYmZqbnJ2en6Ch" +
      "oqOkpaanqKmqq6ytrq+wsbKztLW2t7i5uru8vb6/wMHCw8TFxsfIycrLzM3Oz9DR0tPU1dbX2Nna29zd3t/g4eLj" +
      "5OXm5+jp6uvs7e7v8PHy8/T19vf4+fr7/P3+/wAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA" +
      "AAAAAA=="

  test("unpack reads a python-tarfile archive (read interop)") {
    val raw = java.util.Base64.getDecoder.decode(pyFixtureB64)
    val es = TarCodec.unpack(raw)
    assert(es.map(_._1) == Seq("0001.txt", "0001.json", "img/0002.bin"))
    assert(new String(es(0)._2, "UTF-8") == "hello tar world")
    assert(new String(es(1)._2, "UTF-8") == """{"k": 1}""")
    assert(es(2)._2.length == 768 && es(2)._2(0) == 0 && (es(2)._2(255) & 0xff) == 255)
  }

  test("pack layout is valid ustar: header fields, checksum, block math, round-trip") {
    val entries = Seq(
      "a.txt" -> "alpha".getBytes("UTF-8"),
      "b.bin" -> Array.tabulate[Byte](513)(i => (i % 251).toByte),  // crosses a block
      "empty" -> Array.empty[Byte])
    val tar = TarCodec.pack(entries)
    // total: 512 hdr + 512 data | 512 hdr + 1024 data | 512 hdr + 0 | 2x512 trailer
    assert(tar.length == 512 + 512 + 512 + 1024 + 512 + 1024)
    // POSIX magic + version at 257
    assert(new String(tar, 257, 5, "US-ASCII") == "ustar" && tar(262) == 0)
    assert(tar(263) == '0' && tar(264) == '0')
    // stored checksum equals the blanked-field sum
    val stored = Integer.parseInt(new String(tar, 148, 6, "US-ASCII"), 8)
    val sum = (0 until 512).map(i => if (i >= 148 && i < 156) ' '.toInt else tar(i) & 0xff).sum
    assert(stored == sum)
    assert(TarCodec.unpack(tar).map { case (n, d) => (n, d.toSeq) } ==
      entries.map { case (n, d) => (n, d.toSeq) })
    // determinism: same input, same bytes
    assert(java.util.Arrays.equals(tar, TarCodec.pack(entries)))
    // corrupt checksum fails loudly
    val bad = tar.clone(); bad(0) = (bad(0) + 1).toByte
    intercept[IllegalArgumentException] { TarCodec.unpack(bad) }
    // oversized name refused
    intercept[IllegalArgumentException] { TarCodec.pack(Seq(("x" * 101) -> Array[Byte]())) }
  }

  test("packShards: round-trip, deterministic order, shard sizing") {
    val docs = (1 to 200).map { i =>
      (f"doc-$i%04d.txt", s"document number $i ".repeat(i % 7 + 1).getBytes("UTF-8"))
    }
    val df = docs.toDF("name", "data")
    val shards = TarShards.packShards(df, "name", "data", targetShardBytes = 16384)
      .localCheckpoint(true)
    val back = TarShards.readEntries(shards)
      .select("name", "data").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(back == docs.map { case (n, d) => n -> d.toSeq }.toMap)
    // every shard but the largest-id one lands within one entry of target
    val sizes = shards.select("shard_id", "tar_bytes").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lastId = sizes.keys.max
    val maxEntry = 512L + 512L * 3  // generous bound for these tiny docs
    sizes.foreach { case (id, bytes) =>
      if (id != lastId) assert(bytes <= 16384 + maxEntry + 1024, s"shard $id: $bytes")
    }
    // entries within a shard are name-sorted (deterministic layout)
    val firstShard = shards.orderBy("shard_id").select("tar").first().getAs[Array[Byte]](0)
    val names = TarCodec.unpack(firstShard).map(_._1)
    assert(names == names.sorted)
  }

  // Write-side interop validated out-of-band (round 16): 10 graft-written
  // shards read back entry-exact by BOTH python `tarfile` and GNU `tar -tf`
  // (the loaders a training stack uses). The embedded fixture covers the
  // read side in-suite; the ustar layout asserts above pin the write side.
  test("saveAsTarFiles / loadTarFiles: real .tar files round-trip") {
    val docs = (1 to 40).map(i => (f"e$i%03d", s"payload $i".getBytes("UTF-8")))
    val shards = TarShards.packShards(docs.toDF("name", "data"), "name", "data", 4096)
    val dir = java.nio.file.Files.createTempDirectory("tarshards").toString
    TarShards.saveAsTarFiles(shards, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
    assert(files.nonEmpty && files.forall(_.getName.matches("shard-\\d{5}\\.tar")))
    val back = TarShards.loadTarFiles(spark, dir)
      .select("name", "data").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(back == docs.map { case (n, d) => n -> d.toSeq }.toMap)
  }

  test("packSampleShards: samples never split across shards; suffix-adjacent entries") {
    val samples = (1 to 60).map { i =>
      (f"s$i%04d",
        s"text of sample $i".getBytes("UTF-8"),
        (f"{\"id\": $i}").getBytes("UTF-8"),
        if (i % 3 == 0) null else Array.tabulate[Byte](i * 10)(_.toByte))
    }
    val df = samples.toDF("key", "txt", "json", "bin")
    val shards = TarShards.packSampleShards(df, "key",
      Seq(".txt" -> "txt", ".json" -> "json", ".bin" -> "bin"),
      targetShardBytes = 8192).localCheckpoint(true)
    // every sample's entries live in exactly ONE shard, adjacent, suffix order
    val byShard = shards.select("shard_id", "tar").collect()
      .map(r => r.getLong(0) -> TarCodec.unpack(r.getAs[Array[Byte]](1)).map(_._1))
    val sampleToShards = byShard.flatMap { case (sid, names) =>
      names.map(n => n.substring(0, n.indexOf('.')) -> sid)
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    assert(sampleToShards.values.forall(_.size == 1), "a sample split across shards")
    byShard.foreach { case (_, names) =>
      val keys = names.map(n => n.substring(0, n.indexOf('.')))
      // entries of one sample are consecutive
      assert(keys == keys.sorted, s"entries not sample-adjacent: $names")
    }
    // null parts are skipped, not encoded
    val all = byShard.flatMap(_._2)
    assert(!all.contains("s0003.bin") && all.contains("s0003.txt"))
    // counts line up
    val totals = shards.agg(sum("n_samples"), sum("n_entries")).collect()(0)
    assert(totals.getLong(0) == 60 && totals.getLong(1) == all.length)
  }

  test("manifest + auditManifest: clean delivery empty; tamper detected") {
    val docs = (1 to 30).map(i => (f"m$i%03d", s"entry $i".getBytes("UTF-8")))
    val shards = TarShards.packShards(docs.toDF("name", "data"), "name", "data", 4096)
      .localCheckpoint(true)
    val man = TarShards.manifest(shards).localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("tarman").toString
    TarShards.saveAsTarFiles(shards, dir)
    assert(TarShards.auditManifest(spark, dir, man).count() == 0)
    // tamper with one shard on disk -> hash mismatch; delete another -> missing
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    val f0 = files(0).toPath
    val bytes = java.nio.file.Files.readAllBytes(f0)
    bytes(600) = (bytes(600) + 1).toByte
    java.nio.file.Files.write(f0, bytes)
    files(1).delete()
    val bad = TarShards.auditManifest(spark, dir, man)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bad.size == 2 && bad.values.toSet == Set("hash_mismatch", "missing_on_disk"))
  }
}
