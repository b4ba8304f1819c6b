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

clean:
	$(MAKE) -C csrc clean
