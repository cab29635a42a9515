package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.CosineSimilarity

/** Property-based algebraic laws (SURVEY.md §5.3) on generated
  * micro-DataFrames. Uses plain ScalaCheck driven from FunSuite (no
  * scalatestplus bridge in the offline dep set).
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestBase._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(10)
    .withMaxSize(40)

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: $res")
  }

  private val tokenGen = Gen.oneOf("scan", "merge", "sort", "key", "the",
    "window", "table", "column", "join", "filter")
  private val docGen = Gen.listOf(tokenGen).map(_.mkString(" "))

  test("wordcount combiner law: count(a ++ b) = merge(count(a), count(b))") {
    import spark.implicits._
    def wc(docs: List[String]): Map[String, Long] =
      if (docs.isEmpty) Map.empty
      else docs.toDF("text")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    check("combiner") {
      Prop.forAll(Gen.listOf(docGen), Gen.listOf(docGen)) { (a, b) =>
        val merged = (wc(a).toSeq ++ wc(b).toSeq)
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        wc(a ++ b) == merged
      }
    }
  }

  test("exact dedup is idempotent and keeps min id per key") {
    import spark.implicits._
    check("dedup") {
      Prop.forAll(Gen.nonEmptyListOf(docGen)) { docs =>
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        def dedup(in: org.apache.spark.sql.DataFrame) =
          in.groupBy(col("text")).agg(min("doc_id").as("doc_id"))
            .select("doc_id", "text")
        val once = dedup(df).collect().map(_.toString).sorted.toSeq
        val twice = dedup(dedup(df)).collect().map(_.toString).sorted.toSeq
        val expected = docs.zipWithIndex
          .groupBy(_._1).view.mapValues(_.map(_._2.toLong).min)
          .map { case (t, i) => s"[$i,$t]" }.toSeq.sorted
        once == twice && once == expected
      }
    }
  }

  test("topk(k) equals the k-prefix of the global sort") {
    import spark.implicits._
    check("topk") {
      Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L)),
        Gen.chooseNum(1, 10)) { (xs, k) =>
        val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "v")
        val top = df.orderBy(col("v").desc, col("id")).limit(k)
          .collect().map(_.toString).toSeq
        val prefix = df.orderBy(col("v").desc, col("id"))
          .collect().map(_.toString).take(k).toSeq
        top == prefix
      }
    }
  }

  test("filter commutes with equi-join (pushdown equivalence)") {
    import spark.implicits._
    check("filter-join") {
      Prop.forAll(
        Gen.listOf(Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(0L, 100L))),
        Gen.listOf(Gen.chooseNum(0L, 20L))) { (orders, custs) =>
        val o = orders.zipWithIndex
          .map { case ((c, v), i) => (i.toLong, c, v) }
          .toDF("o_id", "cust", "v")
        val c = custs.distinct.toDF("cust")
        val after = o.join(c, "cust").filter(col("v") > 50)
          .collect().map(_.toString).sorted.toSeq
        val before = o.filter(col("v") > 50).join(c, "cust")
          .collect().map(_.toString).sorted.toSeq
        after == before
      }
    }
  }

  test("cosine_sim: self-similarity 1, symmetric, in [-1, 1]") {
    import spark.implicits._
    CosineSimilarity.register(spark)
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-10.0, 10.0))
      .suchThat(_.exists(_ != 0.0))
    check("cosine") {
      Prop.forAll(vecGen) { v =>
        val df = Seq((v.toArray, v.toArray)).toDF("a", "b")
        val self = df.select(expr("cosine_sim(a, b)")).head().getDouble(0)
        math.abs(self - 1.0) < 1e-9
      } && Prop.forAll(vecGen, vecGen) { (x, y) =>
        val n = math.min(x.size, y.size)
        val a = x.take(n).toArray
        val b = y.take(n).toArray
        val df = Seq((a, b)).toDF("a", "b")
        val ab = df.select(expr("cosine_sim(a, b)")).head().getDouble(0)
        val ba = df.select(expr("cosine_sim(b, a)")).head().getDouble(0)
        // truncation can zero out a vector → NaN; NaN must still be
        // symmetric (bitwise compare), range only applies to real sims
        java.lang.Double.compare(ab, ba) == 0 &&
          (ab.isNaN || (ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9))
      }
    }
  }

  // random (word, freq) histograms over a small alphabet — adversarial
  // for BPE: heavy repeat structure, ties everywhere
  private val histGen: Gen[List[(String, Long)]] = Gen.listOf(
    for {
      w <- Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
      f <- Gen.chooseNum(1L, 9L)
    } yield (w.take(8), f)).map(_.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toList.sortBy(_._1))

  test("bpe learning is greedy-incremental: fewer merges = a prefix") {
    check("bpe prefix") {
      Prop.forAll(histGen, Gen.chooseNum(0, 12)) { (h, n) =>
        val full = operators.Bpe.trainFromHistogram(h, 12).merges.toSeq
        val part = operators.Bpe.trainFromHistogram(h, n).merges.toSeq
        part == full.take(part.length) && part.length <= n
      }
    }
  }

  test("bpe learning is histogram-permutation invariant") {
    check("bpe permutation") {
      Prop.forAll(histGen) { h =>
        operators.Bpe.trainFromHistogram(h, 10).merges.toSeq ==
          operators.Bpe.trainFromHistogram(h.reverse, 10).merges.toSeq
      }
    }
  }

  test("packTokens reproduces the concatenated stream at any seqLen") {
    import spark.implicits._
    val docsGen = Gen.nonEmptyListOf(
      Gen.listOf(Gen.chooseNum(0, 50))).map(_.take(8))
    check("packing stream") {
      Prop.forAll(docsGen, Gen.chooseNum(1, 7)) { (docs, seqLen) =>
        val df = docs.zipWithIndex
          .map { case (ids, i) => (i.toLong, ids) }.toDF("id", "ids")
        val packed = operators.Packing
          .packTokens(df, "id", "ids", seqLen, 99)
          .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
        val stream = packed.sortBy(_._1).flatMap(_._2).toList
        val ref = docs.flatMap(_ :+ 99)
        stream == ref &&
          packed.sortBy(_._1).init.forall(_._2.length == seqLen)
      }
    }
  }

  test("packShuffled permutes whole documents: epoch stream = docs in (hash, id) order") {
    import spark.implicits._
    val docsGen = Gen.nonEmptyListOf(
      Gen.listOf(Gen.chooseNum(0, 50))).map(_.take(8))
    check("packShuffled permutation") {
      Prop.forAll(docsGen, Gen.chooseNum(1, 7), Gen.chooseNum(0L, 5L)) {
        (docs, seqLen, epoch) =>
          val df = docs.zipWithIndex
            .map { case (ids, i) => (i.toLong, ids) }.toDF("id", "ids")
          val stream = operators.Packing
            .packShuffled(df, "id", "ids", seqLen, 99, epoch)
            .collect().sortBy(_.getLong(0))
            .flatMap(_.getSeq[Int](1)).toList
          // reference: documents reordered by the epoch key via Spark's
          // own xxhash64 (collisions broken by id), then concatenated
          val order = df.select(col("id"),
              xxhash64(col("id"), lit(epoch)).as("k"))
            .collect().map(r => (r.getLong(1), r.getLong(0)))
            .sorted.map(_._2.toInt)
          stream == order.toList.flatMap(i => docs(i) :+ 99)
      }
    }
  }

  test("globalCumsum with tie-break equals the sequential scan under (v, tie)") {
    import spark.implicits._
    // heavy tie pressure: v drawn from a tiny domain so buckets and the
    // in-bucket tie ordering both get exercised; (v, tie) unique by
    // construction (tie = index)
    val rowsGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(-3L, 3L), Gen.chooseNum(0L, 20L))).map(_.take(40))
    check("cumsum tie-break") {
      Prop.forAll(rowsGen) { rows =>
        val df = rows.zipWithIndex
          .map { case ((v, c), i) => (v, i.toLong, c) }
          .toDF("v", "tie", "c")
          .repartition(3)
        val got = operators.PrefixSum
          .globalCumsum(df, "v", "tie", Seq("c"))
          .collect()
          .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3)))
          .toMap
        val seq = rows.zipWithIndex
          .map { case ((v, c), i) => (v, i.toLong, c) }
          .sortBy { case (v, t, _) => (v, t) }
        var acc = 0L
        seq.forall { case (v, t, c) =>
          acc += c
          got((v, t)) == acc
        }
      }
    }
  }

  test("heap-merge BPE encode equals the naive lowest-rank sweep") {
    import spark.implicits._
    // Differential oracle for the O(L log L) linked-list+heap encoder:
    // the naive reference re-finds the lowest-rank adjacent pair and
    // replaces ALL its occurrences left-to-right until none is in the
    // table — the textbook sweep the fast path must reproduce exactly.
    def naiveAscii(w: String, merges: Array[(String, String)]): List[String] = {
      val rank = merges.zipWithIndex.toMap
      var syms = (operators.Bpe.codePoints(w) :+ "</w>").toList
      var done = false
      while (!done && syms.length > 1) {
        val present = syms.zip(syms.tail).flatMap(p => rank.get(p).map(p -> _))
        if (present.isEmpty) done = true
        else {
          val (a, b) = present.minBy(_._2)._1
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case x :: y :: t if x == a && y == b => out += (a + b); rest = t
            case x :: t => out += x; rest = t
            case Nil =>
          }
          syms = out.toList
        }
      }
      syms
    }
    // words over a tiny alphabet so merges collide and cascade hard;
    // include LONG words (the regime the heap rewrite exists for)
    val wordGen = for {
      n <- Gen.frequency(4 -> Gen.chooseNum(0, 12), 1 -> Gen.chooseNum(60, 200))
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val histGen2 = Gen.nonEmptyListOf(
      Gen.zip(wordGen.suchThat(_.nonEmpty), Gen.chooseNum(1L, 9L)))
      .map(_.take(8))
    check("heap vs sweep") {
      Prop.forAll(histGen2, wordGen, Gen.chooseNum(1, 25)) { (h, probe, nm) =>
        val model = operators.Bpe.trainFromHistogram(h, nm)
        val got =
          if (probe.isEmpty) Nil
          else operators.Bpe.encode(
            Seq((0L, probe)).toDF("id", "text"), "text", model)
            .select(col("tokens")).head.getSeq[String](0).toList
        got == (if (probe.isEmpty) Nil else naiveAscii(probe, model.merges))
      }
    }
  }

  test("byte-level BPE decode∘encode is the identity on arbitrary valid text") {
    import spark.implicits._
    // valid code points only (unpaired surrogates are not UTF-8 and the
    // JVM replaces them — identity legitimately cannot hold there)
    val cpGen = Gen.frequency(
      6 -> Gen.chooseNum(0x20, 0x7e),
      2 -> Gen.chooseNum(0xa1, 0x2ff),
      1 -> Gen.chooseNum(0x4e00, 0x4eff), // CJK
      1 -> Gen.oneOf(0x9, 0xa, 0x1F600)) // tab, newline, emoji
    val textGen = Gen.listOf(cpGen)
      .map(_.take(60).flatMap(Character.toChars(_)).mkString)
    val corpusGen = Gen.listOf(textGen).map(_.take(6))
    check("byte identity") {
      Prop.forAll(corpusGen, textGen) { (corpus, probe) =>
        // train on ONE corpus, encode a DIFFERENT string: identity must
        // hold for any merge table, not just in-distribution text
        val model = operators.Bpe.trainOnDocs(
          corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("id", "text"),
          "text", 12, mode = operators.Bpe.ModeBytes)
        val out = operators.Bpe.encode(
          Seq((0L, probe)).toDF("id", "text"), "text", model)
          .select(operators.Bpe.decodeCol(col("tokens"), model).as("back"))
          .head.getString(0)
        out == probe
      }
    }
  }
}
