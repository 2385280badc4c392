.PHONY: test bench dryrun native mnist-parity cifar-parity

# Real-data accuracy parity vs the reference's committed N60000_M64 run
# (0.9769 final accuracy).  Needs mnist.npz under $DEEPCGP_DATA_DIR
# (or ~/.cache/deepcgp); refuses the synthetic fallback.
mnist-parity:
	python examples/mnist_parity.py

# Real-data accuracy parity vs the reference's committed cifar_fm10 run
# (0.7385 final accuracy).  Needs cifar10.npz under $DEEPCGP_DATA_DIR.
cifar-parity:
	python examples/cifar_parity.py

test:
	python -m pytest tests/ -q

bench:
	python bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('multichip dryrun ok')"

native:
	python -c "from deepcgp_tpu import native; assert native.lib() is not None; print('native lib built')"
