# Container image for the TPU-native lidar odometry engine.
# Analogue of the reference's Dockerfile (ROS Humble + Ceres build): here the
# stack is JAX; pick the base matching your accelerator:
#   - TPU VM:  python:3.12 + `pip install jax[tpu]`
#   - CPU dev: python:3.12 + `pip install jax`
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential make \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/lidar_odometry_demo_tpu
COPY pyproject.toml README.md ./
COPY lidar_odometry_demo_tpu ./lidar_odometry_demo_tpu
COPY native ./native
COPY config ./config

# jax[tpu] on TPU VMs; plain jax elsewhere
ARG JAX_TARGET=jax
RUN pip install --no-cache-dir "${JAX_TARGET}" scipy && pip install --no-cache-dir .

# build the native IO runtime
RUN make -C native

ENTRYPOINT ["lidar-odometry-tpu"]
CMD ["sim", "--scans", "50"]
