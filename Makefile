# Build system for the native runtime components.
# The Python package needs no build; this covers the C++ codec/loader
# (the CMakeLists.txt analog of the reference build, CMakeLists.txt:1-43 —
# no display-library dependency here: output is written, not displayed).

CXX ?= g++
CXXFLAGS ?= -O2 -std=c++17 -fPIC -pthread
NATIVE_DIR := computervisionimagestich2_tpu/native

.PHONY: all native test bench clean

all: native

native: $(NATIVE_DIR)/libcodec.so

$(NATIVE_DIR)/libcodec.so: $(NATIVE_DIR)/codec.cpp
	$(CXX) $(CXXFLAGS) -shared -o $@ $<

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -f $(NATIVE_DIR)/libcodec.so
