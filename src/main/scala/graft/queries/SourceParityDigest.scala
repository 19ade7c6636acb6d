package graft.queries

/** Canonical content digest of the reference file-parsing golden
  * fixture (reference tests/test-osm-file-parsing.cpp:154-177,
  * tests/data/test_multipolygon.osm: 353 nodes / 140 ways / 40
  * relations, sum of ids 73514), as computed by
  * [[Pipeline8.sourceParity]]: the order-insensitive sum of xxhash64
  * over canonical entity strings (id, 1e-7-grid coords, sorted tags,
  * ordered refs/members). Pinned once from a run of the parity query;
  * all four wire formats (XML / PBF / O5M / OPL) must reproduce it
  * bit for bit — a writer or reader that drops or distorts any
  * transported field moves the sum and fails q112.
  */
object SourceParityDigest {
  val value: String = "-123020259115754939955"
}
