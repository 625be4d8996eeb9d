package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Naming

class NamingSpec extends AnyFunSuite {

  test("reference naming conventions (SURVEY §7.3)") {
    assert(Naming.agg("SALESAMOUNT", "SUM") == "salesamount_sum")
    assert(Naming.lag("x", 1) == "lag_x_1")
    assert(Naming.lag("x", -1) == "lag_x__1") // lead: double underscore
    assert(Naming.movingAvg("salesamount_sum", 4) == "mean_salesamount_sum_4")
    assert(Naming.datePart("orderdate", "week") == "orderdate_week")
    assert(Naming.oneHot("color", Some("RED")) == "color_red")
    assert(Naming.oneHot("class", None) == "class_is_null")
    assert(Naming.targetEncoded("name") == "name_target_encoded")
    assert(Naming.labelEncoded("cat") == "cat_encoded")
    assert(Naming.ttSplit == "tt_split")
  }

  test("cleanse handles punctuation, leading digits, empties") {
    assert(Naming.cleanse("A * (1 - B)") == "a_1_b")
    assert(Naming.cleanse("2col") == "c_2col")
    assert(Naming.cleanse("  ") == "col")
    assert(Naming.cleanse("__x__") == "x")
  }

  test("cleanse is idempotent and always yields a valid identifier") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val s = rnd.nextString(rnd.nextInt(24))
      val c = Naming.cleanse(s)
      assert(Naming.cleanse(c) == c, s"not idempotent for ${s.toList}")
      assert(c.matches("[a-z][a-z0-9_]*"), s"invalid identifier $c")
    }
  }
}
