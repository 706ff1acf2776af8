# One-command regression gate: `make check` = full test suite (incl. the
# full-catalog DuckDB oracle gate) + a 6-query mini-bench at sf0.01 + the
# leak/copy self-check.  Individual targets below for faster loops.

MINIBENCH_QUERIES = q01_pricing_summary,q26_minhash_near_dups,q30_knn_lsh,q50_validated_lineitem,q101_streaming_tumbling_e2e,q110_bm25_retrieval

.PHONY: check test minibench selfcheck oracle bench

check: test minibench selfcheck

test:
	python -m pytest tests/ -q

minibench:
	SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
	SPARK_GRAFT_QUERIES=$(MINIBENCH_QUERIES) python bench.py

selfcheck:
	python tools/selfcheck.py

oracle:
	python tools/oracle_check.py

bench:
	python bench.py
