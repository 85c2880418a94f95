# Container analogue of the reference's Dockerfile (/root/reference/Dockerfile):
# installs the package with the native extension built.
FROM python:3.12-slim
RUN apt-get update && apt-get install -y --no-install-recommends g++ make \
    && rm -rf /var/lib/apt/lists/*
WORKDIR /opt/cymf-tpu
COPY . .
RUN pip install --no-cache-dir jax numpy scipy scikit-learn pandas tqdm pytest \
    && python setup.py build_ext --inplace \
    && pip install --no-cache-dir -e .
CMD ["python", "-m", "pytest", "tests/", "-x", "-q"]
