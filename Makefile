# Round protocol targets. The snapshot gate (tools/snapshot_gate.sh)
# MUST pass before any end-of-round commit: it compiles main+test,
# runs graft.Verify at sf0.001, and replays every oracle in DuckDB.
# Record its final lines in the round notes (ROUND<N>_NOTES.md).

.PHONY: gate verify bench test

# end-of-round gate: compile + spot verify + oracle compare
gate:
	tools/snapshot_gate.sh

# full driver-replica correctness pass at sf0.01
verify:
	SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
	python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out

# benchmark at sf0.1 (one JSON line on stdout; ~4 min at 32 cpus)
bench:
	SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench"

test:
	sbt -batch test
