# Top-level orchestration (reference-repo Makefile parity: build, demo,
# test targets — `Makefile:38-42` drives demo runs there).

CPU_ENV = JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
          XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: all native test bench demo-sdf demo-ofusion eval clean

all: native

native:
	$(MAKE) -C csrc

test:
	$(CPU_ENV) python -m pytest tests/ -q

bench:
	python bench.py

# demo runs on the synthetic analytic room (zero-egress stand-in for the
# reference's demo-kfusion / demo-ofusion targets)
demo-sdf:
	python -m supereight_tpu.apps.runner --dataset synthetic-room \
	    --field sdf -v 256 --frames 96

demo-ofusion:
	python -m supereight_tpu.apps.runner --dataset synthetic-room \
	    --field ofusion -v 256 --frames 96

eval:
	$(CPU_ENV) python -m supereight_tpu.apps.runner \
	    --dataset synthetic-room -v 128 --frames 30

# Driver-metric run on the real ICL-NUIM living-room traj2 dataset
# (`/root/reference/README.md:77-81`).  Expects under $SE_DATASETS
# (default ./datasets):
#   living_room_traj2_loop/   scene_00_0000.depth ...  (text euclidean
#                             ray lengths, 640x480 — the "TUM compatible"
#                             scene archive)
#   livingRoom2.gt.freiburg   ground-truth trajectory
# scene2raw converts to .raw on first use; prints ATE/RPE/fps JSON.
icl-bench:
	python -m supereight_tpu.apps.runner --dataset icl-lr-traj2 \
	    --field sdf -v 256

# CI drill for the target above: fabricates a tiny ICL tree and runs the
# IDENTICAL registry entry + conversion + benchmark + evaluate path
# (zero-egress stand-in; run by tests/test_runner.py too)
icl-bench-dry:
	$(CPU_ENV) python scripts/icl_dry.py

clean:
	$(MAKE) -C csrc clean
