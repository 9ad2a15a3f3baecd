# Developer targets (ref: reference Makefile's test/preprocess/train surface)

.PHONY: test test-fast bench native train-smoke preprocess clean help

help:
	@grep -E '^[a-z-]+:' Makefile | sed 's/:.*//'

native:  ## build the C++ data-loader core
	$(MAKE) -C native

test: native  ## full test suite on a virtual 8-device CPU mesh
	python -m pytest tests/ -q

test-fast:  ## skip the 12 slow-marked tests (measured ~26 min vs ~47 full, 1-core box)
	python -m pytest tests/ -q -m "not slow" -x

bench:  ## headline pairs/sec/chip benchmark (runs on the available accelerator)
	python bench.py

train-smoke:  ## end-to-end smoke training run on synthetic data
	python train.py experiment=smoke_synthetic

preprocess:  ## 3-stage HEST preprocessing (override CFG=preprocess/<name>)
	python -m spatial_clip_tpu.data.preprocessing --config-name $(or $(CFG),preprocess/default) run.stage=$(or $(RUN_STAGE),full)

profile:  ## per-model GFLOPs/params
	python -m spatial_clip_tpu.cli.profiler --model ViT-B-32 --train

rehearsal:  ## full e2e rehearsal: 50 synthetic slides -> preprocess -> shards -> train -> eval (+gap stats, shard replay)
	python scripts/e2e_rehearsal.py --slides 50 --out reports/e2e_rehearsal.json

rehearsal-smoke:  ## CI-sized e2e rehearsal (4 slides, 3 train steps)
	python scripts/e2e_rehearsal.py --smoke --out reports/e2e_rehearsal_smoke.json

rehearsal-pretrained:  ## offline pretrained-tag flow: synth torch ckpt -> tag -> convert -> train -> eval -> re-export (embedding parity)
	python scripts/pretrained_rehearsal.py --model ViT-B-32 --steps 10 --out reports/pretrained_rehearsal.json

clean:
	rm -rf .pytest_cache logs **/__pycache__
	$(MAKE) -C native clean
