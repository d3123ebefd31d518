package graft.functions

import java.time.LocalDateTime

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSuite

/** Golden port of calculate_time_spent busdays cases
  * (tests/test_helpers.py:49-84) + bound properties (SURVEY.md §5).
  */
class BusinessTimeSpec extends SparkSuite {

  private def dt(s: String) = LocalDateTime.parse(s)

  test("Sunday interval has 0 business seconds") {
    assert(BusinessTime.businessSeconds(dt("2023-01-01T10:00:00"), dt("2023-01-01T10:30:00")) == 0L)
  }

  test("Monday 10:00-23:00 caps at 22:00 -> 12h") {
    assert(BusinessTime.businessSeconds(dt("2023-10-16T10:00:00"), dt("2023-10-16T23:00:00")) == 12L * 3600)
  }

  test("order-insensitive (absolute value)") {
    assert(BusinessTime.businessSeconds(dt("2023-10-16T23:00:00"), dt("2023-10-16T10:00:00")) == 12L * 3600)
  }

  test("RU fixed holiday (Feb 23, a Friday in 2024) counts 0") {
    assert(BusinessTime.businessSeconds(dt("2024-02-23T10:00:00"), dt("2024-02-23T12:00:00")) == 0L)
  }

  test("weekend-crossing span counts only workday windows") {
    // Fri 2024-01-12 21:00 -> Mon 2024-01-15 10:00: 1h Friday + 1h Monday
    assert(BusinessTime.businessSeconds(dt("2024-01-12T21:00:00"), dt("2024-01-15T10:00:00")) == 2L * 3600)
  }

  test("before-hours start clips to 09:00") {
    assert(BusinessTime.businessSeconds(dt("2023-10-16T07:00:00"), dt("2023-10-16T10:00:00")) == 3600L)
  }

  test("year-specific extra holidays (decreed non-working days) are injectable") {
    // 2024-04-29 was a decreed non-working Monday in RU (May-holiday bridge)
    val cal = BusinessTime.Calendar(extraHolidays = Set(java.time.LocalDate.of(2024, 4, 29)))
    assert(BusinessTime.businessSeconds(dt("2024-04-29T10:00:00"), dt("2024-04-29T12:00:00"), cal) == 0L)
    // same Monday without the injection counts normally
    assert(BusinessTime.businessSeconds(dt("2024-04-29T10:00:00"), dt("2024-04-29T12:00:00")) == 7200L)
  }

  test("0 <= businessSeconds <= wall-clock seconds (ScalaCheck property)") {
    val anchor = dt("2024-03-01T00:00:00")
    val prop = Prop.forAll(Gen.choose(0L, 60L * 86400), Gen.choose(0L, 60L * 86400)) { (a, b) =>
      val s = anchor.plusSeconds(a)
      val e = anchor.plusSeconds(b)
      val bus = BusinessTime.businessSeconds(s, e)
      val wall = math.abs(java.time.Duration.between(s, e).getSeconds)
      bus >= 0L && bus <= wall
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
