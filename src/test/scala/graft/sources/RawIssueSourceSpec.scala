package graft.sources

import java.nio.file.Files

import graft.SparkSuite

class RawIssueSourceSpec extends SparkSuite {

  test("P9: malformed JSON rows land on the bad-record channel, batch continues") {
    val f = Files.createTempFile("raw", ".ndjson")
    Files.writeString(f,
      """{"key":"A-1","summary":"ok","queue":{"key":"A"},"createdAt":"2024-01-09T10:00:00.000+0000","updatedAt":"2024-01-09T11:00:00.000+0000","changelog":[]}
        |this is not json at all {{{
        |{"key":"A-2","summary":"also ok","queue":{"key":"A"},"createdAt":"2024-01-09T10:00:00.000+0000","updatedAt":"2024-01-09T12:00:00.000+0000","changelog":[]}
        |""".stripMargin)
    val (good, bad) = RawIssueSource.jsonWithBadRecords(spark, f.toString)
    assert(good.count() == 2)
    assert(bad.count() == 1)
    assert(bad.collect()(0).getString(0).contains("not json"))
    // the good side is transformable end-to-end
    val issues = graft.transform.IssueTransform.issues(good)
    assert(issues.count() == 2)
  }
}
