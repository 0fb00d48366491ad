# Reproducible CPU test/dev image for infimum-tpu (counterpart of the
# reference's docker-compose dev environment, reference docker-compose.yml:7-42
# and Vagrantfile). TPU execution requires real hardware; this image runs the
# full fast suite and the multi-chip dryrun on 8 virtual CPU devices.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /work
COPY pyproject.toml README.md ./
COPY infimum_tpu ./infimum_tpu
COPY native ./native
COPY tests ./tests
COPY bench.py __graft_entry__.py ./

RUN pip install --no-cache-dir jax flax optax chex einops numpy pytest && \
    pip install --no-cache-dir -e . && \
    make -C native

ENV XLA_FLAGS=--xla_force_host_platform_device_count=8
CMD ["python", "-m", "pytest", "tests/", "-q", "-m", "not slow"]
