# Dev runner — same target surface as the reference Makefile, adapted to
# the Spark engine (correctness gate + bench replace docker targets; this
# project has no service dependencies to compose).

.PHONY: test check bench demo-quakes demo-economic demo-multi demo-awards demo-filings clean

test:
	python -m pytest tests/ -x -q

# Local replica of the round driver's Spark-vs-DuckDB correctness gate.
check:
	python tools/check_correctness.py /root/testdata/sf0.01

# One-line JSON benchmark over every registered query.
bench:
	python bench.py

demo-quakes:
	python examples/collect_earthquakes.py

demo-economic:
	python examples/collect_economic_indicators.py

demo-multi:
	python examples/multi_source_pipeline.py

demo-awards:
	python examples/validate_federal_awards.py

demo-filings:
	python examples/validate_sec_filings.py

clean:
	find . -type d -name __pycache__ -exec rm -rf {} + 2>/dev/null; true
	find . -name '*.pyc' -delete 2>/dev/null; true
	rm -rf spark-warehouse .pytest_cache
