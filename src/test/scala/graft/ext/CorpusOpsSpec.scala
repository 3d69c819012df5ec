package graft.ext

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Behavioral cross-checks for the corpus-curation operators (q79–q82) —
  * brute-force replays in local Scala over sf0.001, independent of the
  * DuckDB oracle gate (which proves engine parity; these prove the
  * operators mean what they claim).
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = TestSpark.testdata("0.001")

  private lazy val docs: Array[(Long, String, String, String, Long)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))

  test("q79 split assignment partitions the corpus, ~80/10/10, stable across runs") {
    val out = CorpusOps.q79SplitAssign.run(spark, sfDir).collect()
    val total = out.map(_.getLong(2)).sum
    assert(total == docs.length, "every document lands in exactly one (source, split) cell")
    val bySplit = out.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    val trainFrac = bySplit.getOrElse("train", 0L).toDouble / total
    assert(trainFrac > 0.6 && trainFrac < 0.95, s"train fraction $trainFrac far from 0.8")
    // determinism: the assignment is a pure function of doc_id
    val again = CorpusOps.q79SplitAssign.run(spark, sfDir).collect()
    assert(out.sameElements(again))
  }

  test("q80 mixture resample keeps everything for unlisted langs, downsamples en") {
    val out = CorpusOps.q80MixtureResample.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    out.foreach { case (lang, (total, kept)) =>
      assert(kept <= total, s"$lang kept > total")
      if (lang == "de" || lang == "fr") assert(kept == total, s"$lang should keep all docs")
    }
    val (enTotal, enKept) = out("en")
    val enFrac = enKept.toDouble / enTotal
    assert(enFrac > 0.25 && enFrac < 0.75, s"en keep rate $enFrac far from 0.5")
  }

  test("q81 chunks tile every document: stride offsets, full token coverage") {
    val out = CorpusOps.q81Chunking.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val nToks = docs.map { case (id, text, _, _, _) =>
      id -> text.trim.split("\\s+").length.toLong
    }.toMap
    assert(out.keySet == nToks.keySet, "every document produces chunks")
    out.foreach { case (id, chunks) =>
      val n = nToks(id)
      val sorted = chunks.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, idx, start, toks), i) =>
        assert(idx == i && start == i * 30L, s"doc $id chunk $i offset")
        assert(toks == math.min(40L, n - start), s"doc $id chunk $i length")
        assert(toks > 0, s"doc $id empty chunk")
      }
      val last = sorted.last
      assert(last._3 + last._4 == n, s"doc $id tokens uncovered past the last chunk")
    }
  }

  test("q82 OOV rates match a local brute-force vocabulary") {
    val tokenCounts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, text, _, _, _) =>
      text.trim.split("\\s+").foreach(w => tokenCounts(w) = tokenCounts.getOrElse(w, 0L) + 1)
    }
    val vocab = tokenCounts.toSeq.sortBy { case (w, c) => (-c, w) }.take(16).map(_._1).toSet
    val expected = docs.map { case (id, text, _, _, _) =>
      val ws = text.trim.split("\\s+")
      id -> ((ws.length.toLong, ws.count(w => !vocab.contains(w)).toLong))
    }.toMap
    val out = CorpusOps.q82OovRate.run(spark, sfDir).collect()
    assert(out.length == docs.length)
    out.foreach { case Row(id: Long, nToks: Long, nOov: Long, frac: Double) =>
      val (expToks, expOov) = expected(id)
      assert(nToks == expToks, s"doc $id token count")
      assert(nOov == expOov, s"doc $id OOV count")
      assert(math.abs(frac - nOov.toDouble / nToks) < 1e-12)
    }
  }

  test("q92 formats survive adversarial strings the corpus doesn't contain") {
    // The judged q92 proves losslessness on the real corpus (word-soup
    // ASCII); this pins the formats on what production text actually
    // carries: newlines, tabs, JSON-breaking quotes/backslashes, unicode
    // (including astral-plane emoji), leading/trailing whitespace, and
    // the empty string.
    import spark.implicits._
    val nasty = Seq(
      (1L, "line1\nline2\r\nline3"),
      (2L, "quote\" backslash\\ brace{ } bracket[ ]"),
      (3L, "tab\there — déjà vu 日本語 🚀"),
      (4L, "  leading and trailing  "),
      (5L, ""),
      (6L, "control chars: \u0001 and \u0007 bell"))
      .toDF("doc_id", "text")
    val stagePath = java.nio.file.Files.createTempDirectory("graft_q92_spec")
    val stage = stagePath.toString
    try {
      nasty.write.mode("overwrite").orc(s"$stage/orc")
      nasty.write.mode("overwrite").json(s"$stage/jsonl")
      val orc = spark.read.orc(s"$stage/orc").withColumnRenamed("text", "t_orc")
      val json = spark.read.schema(nasty.schema).json(s"$stage/jsonl")
        .withColumnRenamed("text", "t_json")
      val joined = nasty.join(orc, "doc_id").join(json, "doc_id").collect()
      assert(joined.length == 6)
      joined.foreach { r =>
        assert(r.getString(1) == r.getString(2), s"ORC mangled doc ${r.getLong(0)}")
        assert(r.getString(1) == r.getString(3), s"JSON mangled doc ${r.getLong(0)}")
      }
    } finally graft.core.Fs.deleteRecursively(stagePath)
  }

  test("q88 guards degenerate types: single hour and zero variance emit no z-score") {
    // A type observed in ONE hour has no sample variance (n-1 = 0: ANSI
    // Spark would throw DIVIDE_BY_ZERO, DuckDB would yield NULL — gate
    // divergence); a constant-rate type has variance exactly 0 (sqrt(0)
    // divisor). Both must be excluded by the guard, while a genuinely
    // spiky type still reports. Events are written in the corpus's
    // physical shape — an ANNOTATED TIMESTAMP(MICROS) ts column (the
    // footer-sniffing reader refuses plain INT64 rather than guess an
    // epoch unit, so the fixture must carry the real logical type).
    import spark.implicits._
    val h = 3600L * 1000 * 1000 // one hour in micros
    def ev(id: Long, hour: Long, n: Int, typ: String) =
      (0 until n).map(i => (id * 1000 + hour * 100 + i, hour * h + i * 1000L, id, typ, 1.0, "{}"))
    val rows =
      ev(1, 0, 3, "lonely") ++                       // single populated hour: n=1
      (0L until 4L).flatMap(k => ev(2, k, 5, "heartbeat")) ++ // constant rate: variance 0
      ((0L until 9L).flatMap(k => ev(3, k, 1, "spiky")) ++
        ev(3, 9, 30, "spiky"))  // genuine spike: z = (30-3.9)/9.17 ≈ 2.85
    val stagePath = java.nio.file.Files.createTempDirectory("graft_q88_spec")
    val tsTypeConf = "spark.sql.parquet.outputTimestampType"
    val prevTsType = spark.conf.get(tsTypeConf)
    try {
      spark.conf.set(tsTypeConf, "TIMESTAMP_MICROS") // default INT96 has no annotation
      rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
        .selectExpr("event_id", "timestamp_micros(ts_us) AS ts",
          "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$stagePath/events.parquet")
      spark.conf.set(tsTypeConf, prevTsType)
      val out = EventOps.q88RateAnomaly.run(spark, stagePath.toString).collect()
      val types = out.map(_.getString(0)).toSet
      assert(!types.contains("lonely"), "single-hour type must have no z-score")
      assert(!types.contains("heartbeat"), "zero-variance type must have no z-score")
      assert(types == Set("spiky") && out.length == 1, "the genuine spike must report")
      assert(out.head.getLong(2) == 30L)
    } finally {
      spark.conf.set(tsTypeConf, prevTsType) // also on the failure path
      graft.core.Fs.deleteRecursively(stagePath)
    }
  }

  test("q83 SCD2 history matches a per-user replay") {
    val out = EventOps.q83Scd2History.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
    val raw = graft.tables.Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
    val replay = raw
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val expected = replay.toSeq.flatMap { case (uid, evs) =>
      val ordered = evs.sortBy(e => (e._2.getTime, e._2.getNanos, e._3))
      val changes = ordered.foldLeft(Vector.empty[(String, java.sql.Timestamp)]) {
        case (acc, (_, ts, _, et)) =>
          if (acc.isEmpty || acc.last._1 != et) acc :+ (et -> ts) else acc
      }
      changes.zipWithIndex.map { case ((status, from), i) =>
        val to = if (i + 1 < changes.length) Some(changes(i + 1)._2) else None
        (uid, status, from, to, to.isEmpty)
      }
    }.sortBy(e => (e._1, e._3.getTime, e._3.getNanos))
    assert(out.length == expected.length, s"${out.length} vs ${expected.length} SCD2 rows")
    out.zip(expected).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
    assert(raw.length > out.length, "history is compressed vs the raw log")
  }

  test("q146 CUSUM localizes the injected drift and stays silent on clean types") {
    // the oracle replays the same arithmetic over the same injected
    // stream; it cannot see the DETECTOR degenerating (a threshold
    // drifting loose flags natural noise on clean types; one drifting
    // tight misses the doubled-rate window — both keep hashes green).
    // Pin: 'click' (the drifted type) is flagged with onset INSIDE the
    // Jan 20–25 injection window, and every clean type flags nothing.
    val rows = EventOps.q146CusumDrift.run(spark, sfDir).collect()
    val byType = rows.map(r => r.getString(0) ->
      (r.getLong(3), Option(r.getTimestamp(4)))).toMap
    val (clickFlagged, clickOnset) = byType("click")
    assert(clickFlagged > 0L, "drifted type not flagged — detector missed the doubled rate")
    val onset = clickOnset.getOrElse(fail("flagged but no onset"))
    val day = onset.toLocalDateTime.getDayOfMonth
    assert(day >= 20 && day <= 26, s"onset day $day outside the injected drift window")
    byType.view.filterKeys(_ != "click").foreach { case (t, (f, _)) =>
      assert(f == 0L, s"clean type $t flagged $f hours — threshold degenerated loose")
    }
  }

  test("q147 k-anonymity matches a brute-force class census and discriminates") {
    // the oracle replays the banding arithmetic; it cannot see the
    // quasi-identifier scheme degenerating (bands so coarse every class
    // clears every k, or so fine everything is a singleton — both keep
    // hashes green while the report stops informing a release review).
    val custs = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getString(1),
        (math.round(r.getDouble(2) * 100) + 100000L) / 200000L))
    val sizes = custs.groupBy(identity).values.map(_.length.toLong).toSeq
    val rows = EventOps.q147KAnonymity.run(spark, sfDir).collect()
    rows.foreach { r =>
      val k = r.getInt(0)
      assert(r.getLong(1) == sizes.count(_ < k), s"classes_below mismatch at k=$k")
      assert(r.getLong(2) == sizes.filter(_ < k).sum, s"rows_at_risk mismatch at k=$k")
      assert(r.getLong(3) == sizes.size.toLong)
      assert(r.getLong(4) == sizes.min)
    }
    assert(rows.exists(r => r.getLong(1) > 0L), "no class below any k — bands too coarse")
    assert(rows.exists(r => r.getLong(1) < r.getLong(3)),
      "every class below every k — bands degenerated to singletons")
  }

  test("q148 PIT features match a per-user replay; leakage decays over time") {
    // the oracle replays the same windows; it cannot see the PIT
    // ordering silently breaking (an inclusive frame or a nondeterministic
    // tie-break would still hash-match its own replay). Ground truth: an
    // in-memory per-user scan in (ts, event_id) order.
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .filter("event_type IN ('view', 'purchase')")
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getAs[java.time.LocalDateTime](3)))
    val expByDay = ev.groupBy(_._1).values.flatMap { g =>
      // microsecond-exact ordering (events.ts is TIMESTAMP_NTZ micros)
      def micros(t: java.time.LocalDateTime): Long =
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
      val sorted = g.sortBy(e => (micros(e._4), e._2))
      val naive = g.count(_._3 == "view").toLong
      var seen = 0L
      sorted.flatMap { e =>
        val out = if (e._3 == "purchase")
          Some((e._4.getDayOfMonth, seen, naive)) else None
        if (e._3 == "view") seen += 1
        out
      }
    }.toSeq.groupBy(_._1).view.mapValues { xs =>
      (xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).sum,
        xs.count(x => x._3 > x._2).toLong)
    }.toMap
    val rows = EventOps.q148PitFeatures.run(spark, sfDir).collect()
    rows.foreach { r =>
      val exp = expByDay(r.getInt(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == exp,
        s"day ${r.getInt(0)}: got ${(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))} exp $exp")
    }
    // the decay proof is non-vacuous: early days leak far more than late
    val early = rows.filter(_.getInt(0) <= 5)
    val late = rows.filter(_.getInt(0) >= 26)
    def leakFrac(rs: Array[org.apache.spark.sql.Row]) = {
      val pit = rs.map(_.getLong(2)).sum; val nv = rs.map(_.getLong(3)).sum
      (nv - pit).toDouble / math.max(nv, 1L)
    }
    assert(leakFrac(early) > leakFrac(late) + 0.2,
      s"leakage does not decay: early=${leakFrac(early)} late=${leakFrac(late)}")
  }
}
