import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import bench
pps, fps, alive = bench.bench_ribbons()
print(f"ribbons: {fps:.1f} fps, alive={alive:.0f}, {pps/1e6:.1f}M pps")
