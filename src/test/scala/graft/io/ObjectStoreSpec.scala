package graft.io

import graft.SparkSpec

class ObjectStoreSpec extends SparkSpec {

  test("putString / getString round-trip (≙ upload_file)") {
    val dir = tmpDir("objstore")
    ObjectStore.putString(spark, s"$dir/a/rec.jsonl", "{\"id\": \"1\"}\n{\"id\": \"2\"}")
    assert(ObjectStore.getString(spark, s"$dir/a/rec.jsonl") ==
      "{\"id\": \"1\"}\n{\"id\": \"2\"}")
    assert(ObjectStore.exists(spark, s"$dir/a/rec.jsonl"))
  }

  test("copy preserves names across 'buckets' (≙ bucket-to-bucket copy)") {
    val src = tmpDir("bucket-src")
    val dst = tmpDir("bucket-dst") + "/out"
    ObjectStore.putString(spark, s"$src/f1.txt", "one")
    ObjectStore.putString(spark, s"$src/f2.txt", "two")
    assert(ObjectStore.copy(spark, src, dst) == 2)
    assert(ObjectStore.getString(spark, s"$dst/f1.txt") == "one")
    assert(ObjectStore.getString(spark, s"$dst/f2.txt") == "two")
  }

  test("delete is idempotent-false on absent objects") {
    val dir = tmpDir("objstore2")
    ObjectStore.putString(spark, s"$dir/x", "v")
    assert(ObjectStore.delete(spark, s"$dir/x"))
    assert(!ObjectStore.delete(spark, s"$dir/x"))
  }
}
