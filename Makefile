.PHONY: test bench dryrun native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('multichip dryrun ok')"

native:
	python -c "from deepcgp_tpu import native; assert native.lib() is not None; print('native lib built')"
