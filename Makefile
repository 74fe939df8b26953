# Convenience targets. CPU envs force the local backend (the axon
# sitecustomize otherwise routes everything through the TPU tunnel).
CPU_ENV = env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu

test:
	$(CPU_ENV) python -m pytest tests/ -q

bench:
	python bench.py

bench-smoke:
	$(CPU_ENV) python bench.py --smoke --no-tf

campaign:
	python experiments/run_campaign.py

data:
	python datagen/burgers_exact.py data/burgers_shock.npz
	python -c "import sys; sys.path.insert(0,'datagen'); \
	  from schrodinger_exact import generate; generate('data/NLS.npz', substeps=400)"

dryrun:
	env PALLAS_AXON_POOL_IPS= python __graft_entry__.py

.PHONY: test bench bench-smoke campaign data dryrun
