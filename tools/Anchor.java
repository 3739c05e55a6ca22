// Standalone delivered-CPU anchor (single-file launch: `java tools/Anchor.java [rounds]`).
// Same xorshift kernels as graft.ScaleBench.cpuRefMops/cpuRefMopsAll, but with
// zero dependence on the checked-out Scala tree — measurement scripts that
// git-checkout historical commits (attribution A/Bs) sandwich their cells with
// this so every wall is anchor-normalizable regardless of what the commit ships.
public class Anchor {
    static double single(long n) {
        long x = 0x9E3779B97F4A7C15L;
        long t0 = System.nanoTime();
        for (long i = 0; i < n; i++) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; }
        double dt = (System.nanoTime() - t0) / 1e9;
        if (x == 42L) System.err.print("");
        return n / dt / 1e6;
    }

    static double all(int threads, long nPer) throws InterruptedException {
        double[] mops = new double[threads];
        Thread[] ts = new Thread[threads];
        for (int t = 0; t < threads; t++) {
            final int ti = t;
            ts[t] = new Thread(() -> {
                long x = 0x9E3779B97F4A7C15L + ti;
                long t0 = System.nanoTime();
                for (long i = 0; i < nPer; i++) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; }
                double dt = (System.nanoTime() - t0) / 1e9;
                if (x == 42L) System.err.print("");
                mops[ti] = nPer / dt / 1e6;
            });
            ts[t].setDaemon(true);
            ts[t].start();
        }
        double sum = 0;
        for (int t = 0; t < threads; t++) { ts[t].join(); }
        for (int t = 0; t < threads; t++) sum += mops[t];
        return sum;
    }

    public static void main(String[] args) throws Exception {
        int rounds = args.length > 0 ? Integer.parseInt(args[0]) : 3;
        int threads = Integer.parseInt(System.getenv().getOrDefault("SPARK_GRAFT_CPUS", "32"));
        all(threads, 30_000_000L); // JIT warm
        for (int r = 1; r <= rounds; r++) {
            double s = single(300_000_000L);
            double a = all(threads, 150_000_000L);
            System.out.printf(java.util.Locale.ROOT,
                "{\"round\":%d,\"threads\":%d,\"single_mops\":%.1f,\"all_mops\":%.1f}%n",
                r, threads, s, a);
        }
    }
}
