# Reference parity: the upstream Dockerfile (Arch, cmake && make install
# && make bttest, Dockerfile:1-12) builds + installs + tests in one image.
FROM python:3.12-slim
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*
WORKDIR /opt/zklaim-tpu
COPY . .
RUN pip install --no-cache-dir "jax[cpu]" numpy pytest && \
    pip install --no-cache-dir -e .
RUN make native
CMD ["make", "test-fast"]
