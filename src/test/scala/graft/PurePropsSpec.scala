package graft

import org.scalacheck.{Gen, Prop, Properties}
import Prop.{forAll, propBoolean}

/** Property tests for the pure (Spark-free) kernels: identifier cleansing,
  * sampling thresholds, template substitution, media-header robustness.
  */
object PurePropsSpec extends Properties("graft.pure") {

  // ---- docs cannot lie about the driver contract: the README counts are
  // regenerated from SparkEntry itself (round-6 ask #10 — the counts
  // drifted twice when maintained by hand)
  property("README driver-contract counts match SparkEntry") = {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val m = """(\d+) queries, (\d+) with DuckDB oracle SQL""".r.findFirstMatchIn(readme)
    val qs = graft.SparkEntry.queries
    val os = graft.SparkEntry.oracleSql
    (m.nonEmpty :| "README must state the driver-contract counts") &&
      ((m.get.group(1).toInt == qs.size) :|
        s"README says ${m.get.group(1)} queries, SparkEntry has ${qs.size}") &&
      ((m.get.group(2).toInt == os.size) :|
        s"README says ${m.get.group(2)} oracled, SparkEntry has ${os.size}") &&
      (os.keySet.subsetOf(qs.keySet) :|
        s"oracle keys without a query: ${(os.keySet -- qs.keySet).mkString(",")}")
  }

  // ---- Naming.cleanse: always a valid lowercase identifier, idempotent
  property("cleanse yields a valid identifier") = forAll { (s: String) =>
    graft.core.Naming.cleanse(s).matches("[a-z_][a-z0-9_]*")
  }
  property("cleanse is idempotent") = forAll { (s: String) =>
    val once = graft.core.Naming.cleanse(s)
    graft.core.Naming.cleanse(once) == once
  }

  // ---- quoteId: plain names pass through; quoted names always parse as a
  // single backtick-delimited token (embedded backticks doubled)
  property("quoteId round-trips backticks") = forAll { (s: String) =>
    val q = graft.core.Naming.quoteId(s)
    if (s.matches("[A-Za-z_][A-Za-z0-9_]*")) q == s
    else q.startsWith("`") && q.endsWith("`") &&
      q.substring(1, q.length - 1).replace("``", "") == s.replace("`", "")
  }

  // ---- hashThreshold: monotone in the fraction, fixed 15-hex-digit form
  private val unitFrac = Gen.chooseNum(1e-9, 1.0 - 1e-9)
  property("hashThreshold is 15 lowercase hex digits on (0,1)") =
    forAll(unitFrac) { f =>
      graft.ops.JoinOps.hashThreshold(f).matches("[0-9a-f]{15}")
    }
  property("hashThreshold is monotone") =
    forAll(unitFrac, unitFrac) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      graft.ops.JoinOps.hashThreshold(lo) <= graft.ops.JoinOps.hashThreshold(hi)
    }
  property("hashThreshold clamps out-of-range fractions") =
    forAll(Gen.chooseNum(-10.0, 0.0)) { f =>
      graft.ops.JoinOps.hashThreshold(f) == "0"
    } && Prop(graft.ops.JoinOps.hashThreshold(1.0) == "g")

  // ---- WindowHashes ↔ ShingleHashes: the positional windows, sorted and
  // deduped, are exactly the shingle set when the doc holds a full window;
  // shorter docs yield no windows (ShingleHashes falls back to one
  // whole-doc shingle instead — the two kernels' documented divergence)
  private val tokenList =
    Gen.nonEmptyListOf(Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString))
  property("WindowHashes matches ShingleHashes after sort+dedup") =
    forAll(tokenList, Gen.chooseNum(1, 6)) { (toks, w) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
      import org.apache.spark.sql.types.{ArrayType, StringType}
      import org.apache.spark.unsafe.types.UTF8String
      val arr = new GenericArrayData(
        toks.map(UTF8String.fromString).toArray[Any])
      val lit = Literal(arr, ArrayType(StringType))
      val wh = graft.functions.WindowHashes(lit, w).eval(null)
        .asInstanceOf[ArrayData].toLongArray()
      if (toks.length < w) wh.isEmpty
      else {
        val sh = graft.functions.ShingleHashes(lit, w).eval(null)
          .asInstanceOf[ArrayData].toLongArray()
        wh.length == toks.length - w + 1 && wh.toSet == sh.toSet
      }
    }

  // ---- TransformTemplate: substitution resolves every declared
  // placeholder and rejects unknown/missing arguments
  private val ident = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString
  property("template substitution leaves no declared placeholders") =
    forAll(Gen.nonEmptyListOf(ident).map(_.distinct), ident) { (args, v) =>
      args.nonEmpty ==> {
        val tpl = graft.core.TransformTemplate("t", args,
          args.map(a => s"{{$a}}").mkString("SELECT ", ", ", " FROM {{source_table}}"))
        val out = tpl.render(args.map(_ -> v).toMap)
        args.forall(a => !out.contains(s"{{$a}}")) && out.contains("{{source_table}}")
      }
    }

  // ---- ZValue.binOf: a valid bin, monotone in the value, exact on the
  // cut-point lattice (cut i is the LAST value of bin i: binOf uses <=)
  private val cutsGen = Gen.chooseNum(1, 6).flatMap { bits =>
    Gen.listOfN((1 << bits) - 1, Gen.chooseNum(-1e6, 1e6))
      .map(cs => (bits, cs.sorted.toArray))
  }
  property("binOf stays in range and is monotone") =
    forAll(cutsGen, Gen.chooseNum(-2e6, 2e6), Gen.chooseNum(-2e6, 2e6)) {
      case ((bits, cuts), x, y) =>
        val (lo, hi) = if (x <= y) (x, y) else (y, x)
        val (bl, bh) = (graft.functions.ZValue.binOf(cuts, lo, bits),
          graft.functions.ZValue.binOf(cuts, hi, bits))
        bl >= 0 && bh < (1L << bits) && bl <= bh
    }
  property("binOf is exact on the cut lattice") =
    forAll(cutsGen) { case (bits, cuts) =>
      cuts.toSet.toSeq.forall { c =>
        // value equal to a cut belongs to the bin ABOVE every equal cut
        val expected = cuts.count(_ <= c)
        graft.functions.ZValue.binOf(cuts, c, bits) == math.min(expected, (1 << bits) - 1)
      }
    }

  // ---- media decoders: total on arbitrary bytes (a corrupt blob in row
  // 10^9 of a scan must never throw), frames >= 1, dims >= 0
  private val bytesGen = Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
  property("ImageHeaderDecoder is total on arbitrary bytes") =
    forAll(bytesGen) { bytes =>
      val m = graft.ext.ImageHeaderDecoder.decode(bytes)
      m.nFrames >= 1 && m.width >= 0 && m.height >= 0 && m.format.nonEmpty
    }
  property("FakeDecoder is total and deterministic") =
    forAll(bytesGen) { bytes =>
      val a = graft.ext.FakeDecoder.decode(bytes)
      val b = graft.ext.FakeDecoder.decode(bytes)
      a == b && a.nFrames >= 1 && a.width >= 64 && a.height >= 64
    }

  // prefix bytes that *almost* look like each format: decoder must still
  // never throw while walking truncated headers
  private val magic = Gen.oneOf(
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
    Array(0xff, 0xd8, 0xff).map(_.toByte),
    "GIF89a".getBytes,
    "BM".getBytes)
  property("ImageHeaderDecoder survives truncated/corrupt magic headers") =
    forAll(magic, bytesGen) { (m, tail) =>
      val m2 = graft.ext.ImageHeaderDecoder.decode(m ++ tail)
      m2.nFrames >= 1 && m2.width >= 0 && m2.height >= 0
    }

  private val audioMagic = Gen.oneOf(
    "RIFF".getBytes ++ Array[Byte](0, 1, 0, 0) ++ "WAVE".getBytes,
    Array(0xff, 0xfb).map(_.toByte),
    "ID3".getBytes)
  property("AudioHeaderDecoder is total on arbitrary and near-valid bytes") =
    forAll(Gen.oneOf(bytesGen, audioMagic.flatMap(m => bytesGen.map(m ++ _)))) { bytes =>
      val a = graft.ext.AudioHeaderDecoder.decode(bytes)
      a.sampleRate >= 0 && a.channels >= 0 && a.nSamples >= 0L && a.format.nonEmpty
    }

  // the java.text.Normalizer kernel evaluated directly (interpreted path):
  // normalization must be idempotent, and NFC must unify the composed /
  // decomposed encodings of the same rendering
  private def nfc(s: String): String = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    graft.functions.UnicodeNormalize(Literal(UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType), "NFC")
      .eval(null).asInstanceOf[UTF8String].toString
  }
  property("UnicodeNormalize NFC is idempotent and total") = forAll { (s: String) =>
    val once = nfc(s)
    nfc(once) == once
  }
  property("UnicodeNormalize NFC unifies composed and decomposed forms") =
    forAll(Gen.listOf(Gen.oneOf(
      "e\u0301" -> "\u00e9", // e + combining acute vs precomposed
      "a\u0300" -> "\u00e0",
      "o\u0308" -> "\u00f6",
      "n\u0303" -> "\u00f1",
      "x" -> "x"))) { pairs =>
      val decomposed = pairs.map(_._1).mkString
      val composed = pairs.map(_._2).mkString
      nfc(decomposed) == nfc(composed)
    }}
