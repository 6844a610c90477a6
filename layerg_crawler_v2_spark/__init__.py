"""layerg_crawler_v2_spark — a from-scratch PySpark-native rebuild of the
capabilities of u2u-labs/layerg-crawler-v2 (a Go EVM crawler/indexer), re-keyed
to a Common-Crawl-style URL frontier + fetch scheduler.

Reference mapping (see SURVEY.md):
  block scan loop (cmd/onchain.go:75-111)      -> depth-partitioned frontier rounds
  topic/address log filter (cmd/onchain.go:95) -> host allowlist + robots filters
  unique sets (cmd/helpers/unique-set-onchain.go) -> URL-seen anti-join + bloom/cuckoo
  per-chain pacing (cmd/onchain.go:17-24)      -> per-host politeness scheduling
  latest_block checkpoint (cmd/onchain.go:115) -> snapshot-atomic round commits
  GraphQL resolver (cmd/core/query_resolver.go) -> DataFrame query builder
"""

__version__ = "0.1.0"
