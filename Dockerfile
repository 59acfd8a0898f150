# Container build (ref: Dockerfile.desktop / Dockerfile.socket shipped with
# the reference).  CPU-only image: the package runs unmodified on the CPU
# backend; on a TPU VM install the matching jax[tpu] wheel instead.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/openvslam_tpu
COPY openvslam_tpu/ openvslam_tpu/
COPY native/ native/
COPY examples/ examples/
COPY configs/ configs/
COPY assets/ assets/
COPY tools/ tools/

RUN pip install --no-cache-dir "jax[cpu]" flax numpy pyyaml msgpack \
    opencv-python-headless

ENV PYTHONPATH=/opt/openvslam_tpu
# self-contained smoke: synthetic sequence through the full system
CMD ["python", "examples/run_synthetic_slam.py", "--frames", "25"]
