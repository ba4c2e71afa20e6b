# room-slam-tpu
#
# Pure-Python JAX framework; the only compiled artifact is the native JSON
# trace parser (also auto-built lazily on first use).

PY ?= python3

.PHONY: all native test bench bench-scaleup bench-datagen check clean

all: native

native: room_slam_tpu/native/libtraceparser.so

room_slam_tpu/native/libtraceparser.so: room_slam_tpu/native/trace_parser.cc
	g++ -O2 -shared -fPIC $< -o $@

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

bench-scaleup:
	$(PY) bench.py --scaleup

bench-datagen:
	$(PY) bench.py --datagen

# driver entry compile checks (single chip + virtual 8-device mesh)
check:
	$(PY) -c "import __graft_entry__ as g, jax; \
	  fn, a = g.entry(); jax.jit(fn)(*a); print('entry OK')"
	JAX_PLATFORM_NAME=cpu \
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  $(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	rm -f room_slam_tpu/native/libtraceparser.so
