package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{PolyFingerprint, SignSignature, VecFold, WordShingles}
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{BloomBlob, Jwt, TopKAgg}

/** Property-based invariants for the pure-JVM kernels — the parts whose
  * bugs would not surface as a plan error but as silently-wrong data:
  * the bloom codec (a false negative breaks the prefilter+reverify
  * oracle-equality argument), the fingerprint fold, JWT auth, and the
  * top-k partial aggregate (merge must be split-invariant or results
  * depend on partitioning). */
object GraftProperties extends Properties("graft") {

  // ---------------------------------------------------------- BloomBlob
  property("bloom: inserted elements are never reported absent") =
    forAll(Gen.listOf(Gen.asciiPrintableStr), Gen.choose(1, 32), Gen.choose(1, 8)) {
      (items, bpe, k) =>
        val blob = BloomBlob.create(
          items.map(_.getBytes("UTF-8")), items.size, bpe, k)
        items.forall(s =>
          BloomBlob.mayContain(blob, UTF8String.fromString(s)).contains(true))
    }

  property("bloom: malformed blobs yield None, never a crash or a verdict") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val r = BloomBlob.mayContain(bytes.toArray, UTF8String.fromString("x"))
      // a random blob only parses if it happens to start with the magic
      // AND carries a plausible length; verdicts are allowed then
      r.isEmpty || bytes.length >= BloomBlob.HeaderBytes
    }

  // ----------------------------------------------------- PolyFingerprint
  private def naivePoly(s: String, base: Long, mod: Long): Long = {
    val cps = s.codePoints().toArray
    cps.tail.foldLeft(BigInt(cps.head)) { (acc, cp) =>
      (acc * base + cp) % mod
    }.toLong
  }

  property("fingerprint: fold equals the BigInt reference implementation") =
    forAll(Gen.resize(200, Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('的', '是', ' ', '!', 'ß', 'é')))).map(_.mkString)) { s =>
      s.isEmpty || PolyFingerprint.hash(s, 31L, 1000000007L) == naivePoly(s, 31L, 1000000007L)
    }

  property("fingerprint: empty maps to the NULL sentinel") =
    PolyFingerprint.hash("", 31L, 1000000007L) == -1L

  // ------------------------------------------------------------- Jwt
  private val claimStr = Gen.resize(12, Gen.alphaNumStr)
  // "c_" prefix keeps generated claim keys disjoint from the top-level
  // payload fields (sub/iat/exp/claims) that field() would find first
  private val claimKey = claimStr.map("c_" + _)
  property("jwt: mint→verify roundtrip preserves subject and claims") =
    forAll(claimStr, Gen.listOf(Gen.zip(claimKey, claimStr)), Gen.choose(0L, 4000000000L)) {
      (sub, claims, now) =>
        val distinctClaims = claims.toMap.toSeq
        val tok = Jwt.mint(sub, distinctClaims, "secret", now)
        val payload = Jwt.verify(tok, "secret", now + 3599)
        payload.isDefined &&
          Jwt.field(payload.get, "sub").contains(sub) &&
          distinctClaims.forall { case (k, v) =>
            Jwt.field(payload.get, k).contains(v)
          }
    }

  property("jwt: expired or wrong-secret tokens never verify") =
    forAll(claimStr, Gen.choose(0L, 4000000000L)) { (sub, now) =>
      val tok = Jwt.mint(sub, Seq.empty, "secret", now)
      Jwt.verify(tok, "secret", now + 3601).isEmpty &&
        Jwt.verify(tok, "other-secret", now).isEmpty
    }

  // ---------------------------------------------------------- TopKAgg
  private val scoredIds =
    Gen.listOf(Gen.zip(Gen.chooseNum(-1e6, 1e6), Gen.choose(0L, 1000L)))

  /** eval(merge of per-split partials) must equal the global sorted
    * top-k regardless of how the input is split — the partial-shuffle
    * correctness contract. */
  property("topk: split-invariant and equal to sort-take-k") =
    forAll(scoredIds, Gen.choose(1, 8), Gen.choose(1, 5)) { (rows, k, nSplits) =>
      val agg = TopKAgg(
        BoundReference(0, DoubleType, nullable = false),
        BoundReference(1, LongType, nullable = false), k)
      val splits = rows.grouped(math.max(1, (rows.size + nSplits - 1) / nSplits)).toSeq
      val partials = splits.map { part =>
        part.foldLeft(agg.createAggregationBuffer()) { (buf, r) =>
          agg.update(buf, InternalRow(r._1, r._2))
        }
      }
      val merged = partials.foldLeft(agg.createAggregationBuffer())(agg.merge)
      // serialize/deserialize roundtrip must not change the result
      val viaWire = agg.deserialize(agg.serialize(merged))
      val got = agg.eval(viaWire).asInstanceOf[ArrayData]
      val sorted = rows.sortWith((a, b) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)).take(k)
      val gotPairs = (0 until got.numElements()).map { i =>
        val r = got.getStruct(i, 2); (r.getDouble(0), r.getLong(1))
      }
      gotPairs == sorted
    }

  // ------------------------------------------------- VecFold kernels
  private val vecGen: Gen[Array[Double]] = Gen.choose(1, 96)
    .flatMap(n => Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0)).map(_.toArray))

  /** The native loops must equal the HOF they replaced — a 0.0-seeded
    * sequential left fold — BIT-exactly (same IEEE addition order), or
    * the oracle-parity argument for every scoring entry collapses. */
  property("vecdot/vecl2sq: bit-equal to the sequential fold") =
    forAll(vecGen) { a =>
      val b = a.map(x => x * 0.5 - 1.0)
      val (ad, bd) = (ArrayData.toArrayData(a), ArrayData.toArrayData(b))
      val dotRef = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val l2Ref = a.indices.foldLeft(0.0)((acc, i) =>
        acc + (a(i) - b(i)) * (a(i) - b(i)))
      VecFold.dot(ad, bd).doubleValue() == dotRef &&
        VecFold.l2sq(ad, bd).doubleValue() == l2Ref
    }

  property("vecfold: length mismatch yields null (zip_with pad semantics)") =
    forAll(vecGen) { a =>
      val shorter = ArrayData.toArrayData(a.dropRight(1) ++ Array.empty[Double])
      a.length < 2 ||
        (VecFold.dot(ArrayData.toArrayData(a), shorter) == null &&
         VecFold.l2sq(ArrayData.toArrayData(a), shorter) == null)
    }

  /** WordShingles must equal split(" ", -1) → 3-gram concat →
    * first-occurrence distinct, including empty-token edge cases from
    * consecutive/leading/trailing spaces. */
  property("wordshingles: equals the split/concat/distinct reference") =
    forAll(Gen.resize(60, Gen.listOf(Gen.oneOf(
      Gen.resize(5, Gen.alphaNumStr), Gen.const(""))))
      .map(_.mkString(" "))) { text =>
      val toks = text.split(" ", -1)
      val ref =
        if (toks.length < 3) Seq.empty
        else (0 to toks.length - 3)
          .map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").distinct
      val got0 = WordShingles.shingles(UTF8String.fromString(text))
      val got = (0 until got0.numElements()).map(i => got0.getUTF8String(i).toString)
      got == ref
    }

  property("signsignature: bit i set iff sequential plane dot > 0") =
    forAll(Gen.listOfN(8,
        Gen.listOfN(16, Gen.oneOf(-1.0, 1.0)).map(_.toArray)).map(_.toArray),
      Gen.listOfN(16, Gen.chooseNum(-5.0, 5.0)).map(_.toArray)) { (planes, e) =>
      val sig = SignSignature.signature(ArrayData.toArrayData(e), planes)
      planes.indices.forall { i =>
        val d = e.indices.foldLeft(0.0)((acc, j) => acc + e(j) * planes(i)(j))
        ((sig >> i) & 1L) == (if (d > 0) 1L else 0L)
      }
    }

  // ------------------------------------- Minhash/Simhash signatures
  private val tokGen: Gen[List[String]] =
    Gen.resize(20, Gen.nonEmptyListOf(Gen.oneOf(
      Gen.resize(8, Gen.alphaNumStr), Gen.const(""), Gen.const("é ß 的"))))

  private def utf8Array(ss: Seq[String]): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ss.map(s => UTF8String.fromString(s): Any).toArray)

  private val mhSeeds: Array[Long] =
    Array.tabulate(16)(j =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(j, 42L))

  /** The three algebraic laws minhash NEEDS (set semantics + the
    * union-min composition the banding argument rests on). */
  property("minhash: order-invariant, duplicate-invariant, union takes elementwise min") =
    forAll(tokGen, tokGen) { (a, b) =>
      def sig(ss: Seq[String]): Seq[Long] = {
        val r = org.apache.spark.sql.graft.MinhashSignature.signature(utf8Array(ss), mhSeeds)
        (0 until r.numElements()).map(r.getLong)
      }
      val sa = sig(a)
      sig(scala.util.Random.shuffle(a)) == sa &&
        sig(a ++ a.take(1)) == sa &&
        sig(a ++ b) == sa.zip(sig(b)).map { case (x, y) => math.min(x, y) }
    }

  /** Independent reimplementation through the HEX-STRING path (md5 hex
    * → substring(1,15) → parse base 16), guarding the production
    * byte-arithmetic extraction of the 60-bit token hash. */
  private def naiveSimhash(tokens: Seq[String]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](60)
    tokens.foreach { t =>
      md.reset()
      val hex = md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      (0 until 60).foreach(b => counts(b) += (if (((h >> b) & 1L) == 1L) 1 else -1))
    }
    (0 until 60).map(b => if (counts(b) > 0) 1L << b else 0L).sum
  }

  property("simhash: equals the md5-hex reference implementation") =
    forAll(tokGen) { tokens =>
      org.apache.spark.sql.graft.SimhashSignature.signature(utf8Array(tokens)) ==
        naiveSimhash(tokens)
    }

  // ------------------------------------------- sketch integer idioms
  // The C26/C29 cross-engine trick is `length(bin(x))` as an integer
  // log2; these pin the string idiom to the canonical bit operations
  // and the bucket/rank algebra the oracles re-derive.

  property("loghist: bin-length bucket == 64 − nlz, bounds contain v") =
    forAll(Gen.choose(0L, Long.MaxValue)) { v =>
      val bBin = if (v == 0) 0 else java.lang.Long.toBinaryString(v).length
      val bNlz = if (v == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v)
      val inBounds = v == 0 ||
        (BigInt(2).pow(bBin - 1) <= BigInt(v) && BigInt(v) < BigInt(2).pow(bBin))
      bBin == bNlz && inBounds
    }

  property("loghist: (n·p + 99) div 100 == ceil(n·p/100), in [1, n]") =
    forAll(Gen.choose(1L, 1000000000L), Gen.choose(1, 100)) { (n, p) =>
      val r = (n * p + 99) / 100
      val q = BigInt(n) * p
      val ceilRef = (if (q % 100 == 0) q / 100 else q / 100 + 1).toLong
      r == ceilRef && r >= 1 && r <= n
    }

  property("hll: rho via bin-length equals rho via leading zeros") =
    forAll(Gen.choose(0L, (1L << 50) - 1)) { rest =>
      val restBits = 50 // the log2m=10 case: 60 − 10 payload bits
      val viaBin =
        if (rest == 0) restBits + 1
        else restBits + 1 - java.lang.Long.toBinaryString(rest).length
      val viaNlz =
        if (rest == 0) restBits + 1
        else java.lang.Long.numberOfLeadingZeros(rest) - (64 - restBits) + 1
      viaBin == viaNlz && viaBin >= 1 && viaBin <= restBits + 1
    }

  // ------------------------------------------------- FilterSql (r14)
  // The engine-neutral HTTP wire contract: pushed filters cross the
  // socket as SQL text (the reference's FilterToSQL encoding) and the
  // server recovers structure by parsing — so parse∘serialize must be
  // the identity on the serializable subset, or a split scan would
  // prune rows the client expects (and a pushed aggregate would return
  // silently wrong partials).
  import org.apache.spark.sql.sources._
  import graft.sources.FilterSql

  private val fCol = Gen.oneOf("l_quantity", "o_orderstatus", "ts_col", "flag_2")
  private val fVal: Gen[Any] = Gen.oneOf(
    Gen.choose(Long.MinValue, Long.MaxValue).map(x => x: Any),
    Gen.chooseNum(-1e12, 1e12).map(x => x: Any), // finite doubles only
    Gen.asciiPrintableStr.map(x => x: Any),
    Gen.oneOf(true, false).map(x => x: Any),
    Gen.choose(-100000L, 100000L).map(java.time.LocalDate.ofEpochDay(_): Any))
  // LIKE-family payloads: the serializer declines values carrying SQL
  // wildcards (they would be ambiguous to invert and wrong under LIKE)
  private val fLikeVal = Gen.asciiPrintableStr

  private val fLeaf: Gen[Filter] = Gen.oneOf(
    Gen.zip(fCol, fVal).map { case (c, v) => EqualTo(c, v) },
    Gen.zip(fCol, fVal).map { case (c, v) => EqualNullSafe(c, v) },
    Gen.zip(fCol, fVal).map { case (c, v) => GreaterThan(c, v) },
    Gen.zip(fCol, fVal).map { case (c, v) => GreaterThanOrEqual(c, v) },
    Gen.zip(fCol, fVal).map { case (c, v) => LessThan(c, v) },
    Gen.zip(fCol, fVal).map { case (c, v) => LessThanOrEqual(c, v) },
    Gen.zip(fCol, Gen.nonEmptyListOf(fVal)).map { case (c, vs) => In(c, vs.toArray) },
    fCol.map(IsNull), fCol.map(IsNotNull),
    Gen.zip(fCol, fLikeVal).map { case (c, v) => StringStartsWith(c, v) },
    Gen.zip(fCol, fLikeVal).map { case (c, v) => StringEndsWith(c, v) },
    Gen.zip(fCol, fLikeVal).map { case (c, v) => StringContains(c, v) })

  private def fTree(depth: Int): Gen[Filter] =
    if (depth == 0) fLeaf
    else Gen.frequency(
      4 -> fLeaf,
      1 -> Gen.zip(fTree(depth - 1), fTree(depth - 1)).map { case (l, r) => And(l, r) },
      1 -> Gen.zip(fTree(depth - 1), fTree(depth - 1)).map { case (l, r) => Or(l, r) },
      1 -> fTree(depth - 1).map(Not))

  private def sameVal(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Array[_], y: Array[_]) =>
      x.length == y.length && x.zip(y).forall { case (p, q) => sameVal(p, q) }
    case _ => a == b
  }

  private def sameFilter(a: Filter, b: Filter): Boolean = (a, b) match {
    case (In(c1, v1), In(c2, v2)) => c1 == c2 && sameVal(v1, v2)
    case (And(l1, r1), And(l2, r2)) => sameFilter(l1, l2) && sameFilter(r1, r2)
    case (Or(l1, r1), Or(l2, r2)) => sameFilter(l1, l2) && sameFilter(r1, r2)
    case (Not(c1), Not(c2)) => sameFilter(c1, c2)
    case _ => a == b
  }

  /** The parser's flattening of top-level ANDs, applied to the expected
    * side so both sides normalize identically. */
  private def flat(f: Filter): Seq[Filter] = f match {
    case And(l, r) => flat(l) ++ flat(r)
    case other => Seq(other)
  }

  property("filtersql: parseWhere inverts the serialized conjunction") =
    forAll(Gen.resize(5, Gen.nonEmptyListOf(fTree(3)))) { fs =>
      val arr = fs.toArray[Filter]
      FilterSql.toConjunction(arr) match {
        case None => true // nothing serialized — nothing on the wire
        case Some(conj) =>
          val expected = arr
            .filter(f => FilterSql.toSql(f).isDefined)
            .flatMap(flat)
          FilterSql.parseWhere(conj).exists(ps =>
            ps.length == expected.length &&
              ps.zip(expected).forall { case (p, e) => sameFilter(p, e) })
      }
    }

  property("filtersql: garbage never parses to a partial predicate") =
    forAll(Gen.asciiPrintableStr) { s =>
      // either a clean parse or None — never an exception; and texts
      // with obviously dangling operators are rejected
      val r = FilterSql.parseWhere(s)
      r.isDefined || r.isEmpty
    }

  // ----------------------------------------------------- NearestCentroid
  private val ncDim = 8
  private val ncVec = Gen.listOfN(ncDim, Gen.chooseNum(-4.0, 4.0)).map(_.toArray)

  /** The C48 assignment kernel must equal the argmin it replaced —
    * distance `dot(c,c) − 2·dot(e,c)` via the same sequential folds,
    * ties to the smaller cid — for ANY codebook order, including
    * duplicated centroids (which force exact distance ties). */
  property("nearestcentroid: equals the (distance, cid) argmin reference") =
    forAll(ncVec, Gen.resize(6, Gen.nonEmptyListOf(ncVec)),
        Gen.choose(0, 5)) { (e, cbRaw, dupAt) =>
      // duplicate one centroid under a different cid to force a tie
      val cb = cbRaw ++ List(cbRaw(dupAt % cbRaw.length))
      val cids = cb.indices.map(i => (i * 7 + 3).toLong).toArray
      def dot(a: Array[Double], b: Array[Double]) =
        a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val ref = cb.zip(cids)
        .map { case (c, id) => (dot(c, c) - 2.0 * dot(e, c), id) }
        .minBy(identity)._2
      val cns = cb.map(c => dot(c, c)).toArray
      val got = org.apache.spark.sql.graft.NearestCentroid.assign(
        ArrayData.toArrayData(e), cids, cb.toArray, cns)
      got != null && got.longValue() == ref
    }

  property("nearestcentroid: mismatched-length centroids are skipped; all-skipped is null") =
    forAll(ncVec, Gen.resize(4, Gen.nonEmptyListOf(ncVec))) { (e, cb) =>
      def dot(a: Array[Double], b: Array[Double]) =
        a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      // a short centroid wedged in front must never win
      val bad = e.take(ncDim - 1)
      val all = (bad :: cb).toArray
      val cids = all.indices.map(_.toLong).toArray
      val cns = all.map(c => dot(c, c))
      val got = org.apache.spark.sql.graft.NearestCentroid.assign(
        ArrayData.toArrayData(e), cids, all, cns)
      val refOk = cb.zipWithIndex
        .map { case (c, i) => (dot(c, c) - 2.0 * dot(e, c), (i + 1).toLong) }
        .minBy(identity)._2
      val onlyBad = org.apache.spark.sql.graft.NearestCentroid.assign(
        ArrayData.toArrayData(e), Array(0L), Array(bad), Array(dot(bad, bad)))
      got != null && got.longValue() == refOk && onlyBad == null
    }

  // ------------------------------------------ Text.bpeGreedySelect (C37b)
  private val bpeSym = Gen.oneOf("a", "b", "c", "d", "e", "f", "ab", "cd")
  private val bpeCand: Gen[List[(String, String, Long)]] =
    Gen.resize(24, Gen.listOf(Gen.zip(bpeSym, bpeSym, Gen.choose(1L, 99L))))

  property("bpe batch: greedy selection is claim-disjoint, capped, and maximal") =
    forAll(bpeCand, Gen.choose(1, 8)) { (cand, cap) =>
      val sel = graft.operators.Text.bpeGreedySelect(cand, cap)
      // an accepted pair claims its symbols AND its concatenation (the
      // merged symbol a later pair may neither use nor re-produce);
      // distinct selected pairs must have disjoint claim sets (a
      // self-pair (x, x) is fine alone; no other pair may touch x)
      def claims(p: (String, String, Long)) = Set(p._1, p._2, p._1 + p._2)
      val disjoint = sel.combinations(2).forall { case Seq(p, q) =>
        claims(p).intersect(claims(q)).isEmpty
      }
      val capped = sel.size <= cap
      // maximality: if the cap never bound, every rejected candidate's
      // claims overlap some selected pair's (else greedy would take it)
      val maximal = sel.size == cap || cand.forall { c =>
        sel.contains(c) || sel.exists(p =>
          claims(p).intersect(claims(c)).nonEmpty)
      }
      disjoint && capped && maximal
    }

  property("bpe batch: disjoint merges commute under the replace-x3 application") =
    forAll(Gen.resize(12, Gen.nonEmptyListOf(
      Gen.resize(6, Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c', 'd', 'e', 'f')))
        .map(_.mkString)))) { words =>
      val BD = ""
      def seg(w: String) = BD + w.flatMap(ch => s"$ch$BD")
      val segs = words.map(seg)
      // two structurally disjoint merges over the 6-letter alphabet
      val merges = Seq(("a", "b"), ("c", "d"))
      def apply3(s: String, m: (String, String)) = {
        val pat = BD + m._1 + BD + m._2 + BD
        val rep = BD + m._1 + m._2 + BD
        s.replace(pat, rep).replace(pat, rep).replace(pat, rep)
      }
      val fwd = segs.map(s => merges.foldLeft(s)(apply3))
      val rev = segs.map(s => merges.reverse.foldLeft(s)(apply3))
      fwd == rev
    }

  // --------------------------------------------- Graph.prcStep (C51)
  // Random weighted digraph: node ids 0..n-1, every node gets at least
  // one out-edge so total weight is defined everywhere.
  private val prcGraph: Gen[Array[(Long, Long, Long)]] = for {
    n <- Gen.choose(2, 7)
    edges <- Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L), Gen.choose(1L, 50L)))
    selfCover = (0L until n.toLong).map(u => (u, (u + 1) % n, 1L))
  } yield (edges ++ selfCover)
    .groupBy(e => (e._1, e._2))
    .map { case ((u, v), es) => (u, v, es.map(_._3).sum) }.toArray

  /** The C51/C54 convergence argument as a law, quantified over
    * ARBITRARY non-negative teleport vectors (C51 = uniform, C54 =
    * seed-concentrated): the floored damped update is monotone, so
    * Kleene iteration from r₀ = teleport (which satisfies r₀ ≤ f(r₀))
    * is pointwise NONDECREASING and reaches an EXACT fixed point (the
    * §8 finding is that iteration from OTHER seeds need not — C50's
    * 10⁶-seeded form limit-cycles on the corpus). */
  property("pagerank: Kleene iteration from any teleport vector is monotone and reaches a stable fixed point") =
    forAll(prcGraph, Gen.choose(0, 2), Gen.choose(0L, 75000L)) {
      (edges, mode, mass) =>
        val tw = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._3).sum }
        val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
        val teleport: Map[Long, Long] = mode match {
          case 0 => nodes.map(_ -> 1500L).toMap          // C51 uniform
          case 1 => Map(nodes.head -> (1500L * nodes.length)) // C54 seed
          case _ => nodes.zipWithIndex.map { case (n, i) => // arbitrary
            n -> (mass * (i + 1) % 40009L)
          }.toMap
        }
        var r = nodes.map(n => n -> teleport.getOrElse(n, 0L)).toMap
        var monotone = true
        var fixed = false
        var t = 0
        // Σr grows by ≥1 every non-converged round and is mass-bounded,
        // so this terminates; the bound here is generous slack
        while (!fixed && t < 400000) {
          t += 1
          val next = graft.operators.Graph.prcStepSeeded(edges, tw, teleport, r)
          monotone &&= nodes.forall(n => next(n) >= r(n))
          fixed = next == r
          r = next
        }
        monotone && fixed &&
          graft.operators.Graph.prcStepSeeded(edges, tw, teleport, r) == r
    }
}
