"""kf2vec CLI: same subcommands, flags and defaults as the reference
(main.py:971-1495), dispatching into the TPU-native engines.

Commands:
  get_kmers                Extract k-mers + frequencies as FSW .npy matrices
  get_frequencies          Genome -> canonical k-mer frequency .kf vector
  divide_tree              Split phylogeny into subtrees (sum_branch)
  scale_tree               Multiply all edge lengths
  get_distances            Patristic distance matrices (.di_mtrx)
  train_classifier         Train the subtree classifier
  classify                 Classify query samples
  train_model_set          Train per-subtree distance models (FSW or dense)
  query                    Query distance models -> APPLES inputs
  build_library            Wrapper: frequencies+divide+distances+train both
  process_query_data       Wrapper: frequencies+classify+query
  get_chunks               Genome -> 10kb-window chunk .kf matrices
  train_model_set_chunks   Chunk-streaming distance trainer
  train_classifier_chunks  Chunk-streaming classifier trainer
  get_secondary_classes    2nd/3rd/4th-best classes post-processor
"""

from __future__ import annotations

import argparse
import glob
import os

from . import defaults as D
from . import __version__

VERSION = f"kf2vec-tpu {__version__}"


def _cmd_get_kmers(args):
    from .ingest.kmers import get_kmers

    get_kmers(args.input_dir, args.output_dir, args.k)


def _cmd_get_frequencies(args):
    from .ingest.frequencies import get_frequencies

    get_frequencies(
        args.input_dir,
        args.output_dir,
        k=args.k,
        threads=args.p,
        pseudocount=args.pseudocount,
        raw_cnt=getattr(args, "raw_cnt", False),
    )


def _cmd_divide_tree(args):
    from .ingest.tree_ops import divide_tree

    divide_tree(args.tree, args.size, single_cut=getattr(args, "tc_single_cut", False))


def _cmd_scale_tree(args):
    from .ingest.tree_ops import scale_tree

    scale_tree(args.tree, args.factor)


def _cmd_get_distances(args):
    from .ingest.tree_ops import get_distances

    get_distances(args.tree, args.subtrees, args.mode)


def _cmd_train_classifier(args):
    from .train.classifier import train_classifier_func

    files = sorted(glob.glob(os.path.join(args.input_dir, "*.kf")))
    train_classifier_func(
        args.input_dir, files, args.subtrees, args.e, args.hidden_sz, args.batch_sz,
        args.lr, args.lr_min, args.lr_decay, args.seed, args.mask, args.o,
        resume=args.resume,
    )


def _cmd_classify(args):
    from .infer.classify import classify_func

    files = sorted(glob.glob(os.path.join(args.input_dir, "*.kf")))
    classify_func(args.input_dir, files, args.model, args.seed, args.o, args.block)


def _cmd_train_model_set(args):
    from .train.distance import train_model_set_func

    pattern = "*.kf" if args.no_fsw else "*.npy"
    files = sorted(glob.glob(os.path.join(args.input_dir, pattern)))
    train_model_set_func(
        args.input_dir, files, args.subtrees, args.true_dist, args.e, args.hidden_sz,
        args.embed_sz, args.batch_sz, args.lr, args.lr_min, args.lr_decay, args.clade,
        args.seed, args.o, test_ids_path=args.test_set, save_interval=args.save_interval,
        use_fsw=not args.no_fsw, base_dim=args.base_dim, fswout_dim=args.fswout_dim,
        resume=args.resume, fsw_lazy_refresh=args.fsw_lazy_refresh,
    )


def _cmd_query(args):
    from .infer.query import query_func

    files = sorted(
        glob.glob(os.path.join(args.input_dir, "*.kf"))
        + glob.glob(os.path.join(args.input_dir, "*.npy"))
    )
    query_func(
        args.input_dir, files, args.model, args.classes, args.seed, args.o,
        remap_path=args.remap, block_size=args.block,
    )


def _cmd_build_library(args):
    """get_frequencies -> divide_tree -> get_distances -> train_classifier ->
    train_model_set (main.py:569-622)."""
    if args.mode == "full_only":
        raise SystemExit(
            "build_library needs per-subtree distance matrices to train the "
            "distance models; -mode full_only produces only the full-tree "
            "matrix (use 'hybrid' or 'subtrees_only')"
        )
    from .ingest.frequencies import get_frequencies
    from .ingest.tree_ops import divide_tree, get_distances
    from .train.classifier import train_classifier_func
    from .train.distance import train_model_set_func

    print("\n==> Computing k-mer frequences\n")
    get_frequencies(
        args.input_dir, args.output_dir, k=args.k, threads=args.p,
        pseudocount=args.pseudocount, raw_cnt=args.raw_cnt,
    )
    print("\n==> Splitting phylogeny into subtrees\n")
    subtrees = divide_tree(args.tree, args.size)
    print("\n==> Computing distance matrices\n")
    get_distances(args.tree, subtrees, args.mode)
    tree_dir = os.path.split(args.tree)[0]

    print("\n==> Training classifier model\n")
    files = sorted(glob.glob(os.path.join(args.output_dir, "*.kf")))
    train_classifier_func(
        args.output_dir, files, subtrees, args.cl_epochs, args.cl_hidden_sz,
        args.cl_batch_sz, args.cl_lr, args.cl_lr_min, args.cl_lr_decay, args.cl_seed,
        False, args.output_dir,
    )
    print("\n==> Training distance models\n")
    train_model_set_func(
        args.output_dir, files, subtrees, tree_dir, args.di_epochs, args.di_hidden_sz,
        args.di_embed_sz, args.di_batch_sz, args.di_lr, args.di_lr_min,
        args.di_lr_decay, None, args.di_seed, args.output_dir, use_fsw=False,
    )
    print("\n==> Building library step is completed!\n")


def _cmd_process_query_data(args):
    """get_frequencies -> classify -> query (main.py:626-651)."""
    from .infer.classify import classify_func
    from .infer.query import query_func
    from .ingest.frequencies import get_frequencies

    print("\n==> Computing k-mer frequences\n")
    get_frequencies(
        args.input_dir, args.output_dir, k=args.k, threads=args.p,
        pseudocount=args.pseudocount,
    )
    print("\n==> Classifying query samples\n")
    files = sorted(glob.glob(os.path.join(args.output_dir, "*.kf")))
    classify_func(
        args.output_dir, files, args.classifier_model, args.cl_seed, args.output_dir,
        D.DEFAULT_BLOCK_SZ,
    )
    # FSW subtree models consume {name}_k{k}.npy point sets rather than .kf
    # vectors — produce them from the raw queries before querying (the
    # reference could never query FSW models at all; query.py:118-126)
    fsw_ks = set()
    from .train.checkpoint import fsw_k_from_meta, load_checkpoint_meta

    for ckpt in glob.glob(os.path.join(args.distance_model, "model_subtree_*.ckpt")):
        try:
            # meta-only read: probing N subtree models must not deserialize
            # every model's full weights (query_func reloads them anyway)
            model_name, meta = load_checkpoint_meta(ckpt)
            if model_name == "NeuralNetFSW":
                fsw_ks.add(fsw_k_from_meta(meta))
        except Exception as e:
            print(f"WARNING: could not inspect {ckpt}: {e}")
            continue
    for fk in sorted(fsw_ks):
        print(f"\n==> Computing k-mer point sets for FSW models (k={fk})\n")
        from .ingest.kmers import get_kmers

        get_kmers(args.input_dir, args.output_dir, k=fk)
    print("\n==> Computing model distances\n")
    query_func(
        args.output_dir, files, args.distance_model, args.output_dir, args.di_seed,
        args.output_dir,
    )
    print("\n==> Query processing step is completed!\n")


def _cmd_serve(args):
    from .infer.serve import ServeDaemon, _exit_daemon

    daemon = ServeDaemon(args)
    if args.warm:
        daemon.handle_warm({})
    rc = daemon.serve()
    _exit_daemon(daemon, rc)  # hard exit if wedged workers were abandoned
    raise SystemExit(rc)


def _cmd_get_chunks(args):
    from .ingest.chunks import get_chunks

    get_chunks(
        args.input_dir, args.output_dir, k=args.k, threads=args.p,
        pseudocount=args.pseudocount,
    )


def _cmd_train_model_set_chunks(args):
    from .train.chunks import train_model_set_chunks_func

    files = sorted(glob.glob(os.path.join(args.input_dir, "*.kf")))
    train_model_set_chunks_func(
        args.input_dir, args.input_dir_fullgenomes, files, args.subtrees,
        args.true_dist, args.e, args.hidden_sz, args.embed_sz, args.batch_sz,
        args.lr, args.lr_min, args.lr_decay, args.clade, args.seed, args.cap, args.o,
        resume=args.resume,
    )


def _cmd_train_classifier_chunks(args):
    from .train.chunks import train_classifier_chunks_func

    files = sorted(glob.glob(os.path.join(args.input_dir, "*.kf")))
    train_classifier_chunks_func(
        args.input_dir, args.input_dir_fullgenomes, files, args.subtrees, args.e,
        args.hidden_sz, args.batch_sz, args.lr, args.lr_min, args.lr_decay,
        args.seed, args.mask, args.cap, args.o,
        resume=args.resume,
    )


def _cmd_get_secondary_classes(args):
    from .infer.secondary import write_secondary_classes

    write_secondary_classes(args.classes)


def _add_k(p, lo=D.MIN_K_LEN, hi=D.MAX_K_LEN):
    p.add_argument(
        "-k", type=int, choices=list(range(lo, hi + 1)), default=D.DEFAULT_K_LEN,
        help=f"K-mer length [{lo}-{hi}]. Default: {D.DEFAULT_K_LEN}", metavar="K",
    )


def _add_p(p):
    cpus = os.cpu_count() or 1
    p.add_argument(
        "-p", type=int, default=cpus,
        help=f"Max number of processors to use [1-{cpus}]. Default: {cpus}", metavar="P",
    )


def _add_resume(p):
    p.add_argument("-resume", action="store_true",
                   help="Resume from the last autosaved trainer state")


def _add_train_common(p, epochs_default):
    p.add_argument("-e", type=int, default=epochs_default,
                   help=f"Number of epochs. Default: {epochs_default}")
    p.add_argument("-hidden_sz", type=int, default=D.HIDDEN_SIZE_FC1,
                   help=f"Hidden size. Default: {D.HIDDEN_SIZE_FC1}")
    p.add_argument("-batch_sz", type=int, default=D.BATCH_SIZE,
                   help=f"Batch size. Default: {D.BATCH_SIZE}")
    p.add_argument("-lr", type=float, default=D.LEARNING_RATE,
                   help=f"Start learning rate. Default: {D.LEARNING_RATE}")
    p.add_argument("-lr_min", type=float, default=D.LEARNING_RATE_MIN,
                   help=f"Minimum learning rate. Default: {D.LEARNING_RATE_MIN}")
    p.add_argument("-lr_decay", type=float, default=D.LEARNING_RATE_DECAY,
                   help=f"Learning rate decay. Default: {D.LEARNING_RATE_DECAY}")
    p.add_argument("-seed", type=int, default=D.SEED, help=f"Random seed. Default: {D.SEED}")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description=f"K-mer frequency to distance (TPU-native)\n{VERSION}",
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("-v", "--version", action="version", version=VERSION)
    sub = parser.add_subparsers(title="commands", dest="command")

    p = sub.add_parser("get_kmers", description="Extract kmers and frequencies from FASTA files")
    p.add_argument("-input_dir")
    p.add_argument("-output_dir")
    _add_k(p)
    p.set_defaults(func=_cmd_get_kmers)

    p = sub.add_parser("get_frequencies", description="Process a library of reference genome-skims or assemblies")
    p.add_argument("-input_dir")
    p.add_argument("-output_dir")
    _add_k(p)
    _add_p(p)
    p.add_argument("-pseudocount", action="store_true",
                   help="Computes k-mer counts with 0.5 pseudocount added to each frequency value")
    p.add_argument("-raw_cnt", action="store_true",
                   help="Computes raw k-mer counts without normalization")
    p.set_defaults(func=_cmd_get_frequencies)

    p = sub.add_parser("divide_tree", description="Divides input phylogeny into subtrees.")
    p.add_argument("-tree", help="Input phylogeny (a .newick/.nwk format)")
    p.add_argument("-size", type=int, default=D.DEFAULT_SUBTREE_SZ,
                   help=f"Size of the subtree. Default: {D.DEFAULT_SUBTREE_SZ}")
    # hidden (like the reference's -mask): upstream-TreeCluster single-cut
    # ambiguity resolution instead of the contract-preserving default
    p.add_argument("-tc_single_cut", action="store_true", help=argparse.SUPPRESS)
    p.set_defaults(func=_cmd_divide_tree)

    p = sub.add_parser("scale_tree", description="Scales all edges in the tree by multiplier.")
    p.add_argument("-tree")
    p.add_argument("-factor", type=float, default=D.DEFAULT_MULTIPLIER,
                   help=f"Multiplier. Default: {D.DEFAULT_MULTIPLIER}")
    p.set_defaults(func=_cmd_scale_tree)

    p = sub.add_parser("get_distances", description="Computes distance matrices")
    p.add_argument("-tree", required=True)
    p.add_argument("-subtrees")
    p.add_argument("-mode", type=str, default="subtrees_only", metavar="",
                   help="Ways to perform distance computation [subtrees_only]. Default: subtrees_only")
    p.set_defaults(func=_cmd_get_distances)

    p = sub.add_parser("train_classifier", description="Train classifier model based on backbone subtrees")
    p.add_argument("-input_dir")
    p.add_argument("-subtrees")
    _add_train_common(p, D.DEFAULT_CL_EPOCHS)
    p.add_argument("-mask", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("-o", help="Model output path")
    _add_resume(p)
    p.set_defaults(func=_cmd_train_classifier)

    p = sub.add_parser("classify", description="Classifies query inputs using previously trained classifier model")
    p.add_argument("-input_dir")
    p.add_argument("-model")
    p.add_argument("-block", type=int, default=D.DEFAULT_BLOCK_SZ,
                   help=f"Block size for file processing. Default: {D.DEFAULT_BLOCK_SZ}")
    p.add_argument("-seed", type=int, default=D.SEED)
    p.add_argument("-o", help="Output path")
    p.set_defaults(func=_cmd_classify)

    p = sub.add_parser("train_model_set", description="Trains individual models for each subtree")
    p.add_argument("-input_dir")
    p.add_argument("-test_set")
    p.add_argument("-true_dist")
    p.add_argument("-subtrees")
    _add_train_common(p, D.DEFAULT_DI_EPOCHS)
    p.add_argument("-embed_sz", type=int, default=D.EMBEDDING_SIZE,
                   help=f"Embedding size. Default: {D.EMBEDDING_SIZE}")
    p.add_argument("-clade", type=int, nargs="*", help="Clade number to train. Default: all")
    p.add_argument("-save_interval", type=int,
                   help="Save model after specified interval of epochs. Default: last")
    p.add_argument("-o", help="Model output path")
    p.add_argument("-no_fsw", action="store_true", help="Keep original model")
    p.add_argument("-fswout_dim", type=int, default=D.FSW_OUT_DIM)
    p.add_argument("-base_dim", type=int, default=D.FSW_BASE_DIM)
    p.add_argument("-fsw_lazy_refresh", type=int, default=None,
                   help="FSW acceleration (extension): re-sort the FSW "
                        "projections every N steps instead of every step "
                        "(shared-vocab clades only). Default: auto — engage "
                        f"at N={D.FSW_LAZY_AUTO_REFRESH} when the clade fits "
                        "the per-device plane budget. 0 = exact per-step sort")
    _add_resume(p)
    p.set_defaults(func=_cmd_train_model_set)

    p = sub.add_parser("query", description="Query models")
    p.add_argument("-input_dir")
    p.add_argument("-model")
    p.add_argument("-classes")
    p.add_argument("-block", type=int, default=D.DEFAULT_BLOCK_SZ)
    p.add_argument("-seed", type=int, default=D.SEED)
    p.add_argument("-remap", help='Remap file with alternative output names ("label" and "new_label" columns in .tsv format)')
    p.add_argument("-o", help="Output path")
    p.set_defaults(func=_cmd_query)

    p = sub.add_parser("build_library", description="Wrapper: get_frequencies, divide_tree, get_distance, train_classifier, train_model_set")
    p.add_argument("-input_dir")
    p.add_argument("-output_dir")
    _add_k(p)
    _add_p(p)
    p.add_argument("-pseudocount", action="store_true")
    p.add_argument("-raw_cnt", action="store_true")
    p.add_argument("-tree")
    p.add_argument("-size", type=int, default=D.DEFAULT_SUBTREE_SZ)
    p.add_argument("-mode", type=str, default="hybrid", choices=["full_only", "hybrid", "subtrees_only"], metavar="")
    for prefix, epochs in (("cl", D.DEFAULT_CL_EPOCHS), ("di", D.DEFAULT_DI_EPOCHS)):
        p.add_argument(f"-{prefix}_epochs", type=int, default=epochs)
        p.add_argument(f"-{prefix}_hidden_sz", type=int, default=D.HIDDEN_SIZE_FC1)
        p.add_argument(f"-{prefix}_batch_sz", type=int, default=D.BATCH_SIZE)
        p.add_argument(f"-{prefix}_lr", type=float, default=D.LEARNING_RATE)
        p.add_argument(f"-{prefix}_lr_min", type=float, default=D.LEARNING_RATE_MIN)
        p.add_argument(f"-{prefix}_lr_decay", type=float, default=D.LEARNING_RATE_DECAY)
        p.add_argument(f"-{prefix}_seed", type=int, default=D.SEED)
    p.add_argument("-di_embed_sz", type=int, default=D.EMBEDDING_SIZE)
    p.set_defaults(func=_cmd_build_library)

    p = sub.add_parser("process_query_data", description="Wrapper: get_frequencies, classify, query")
    p.add_argument("-input_dir")
    p.add_argument("-output_dir")
    _add_k(p)
    _add_p(p)
    p.add_argument("-pseudocount", action="store_true")
    p.add_argument("-classifier_model")
    p.add_argument("-cl_seed", type=int, default=D.SEED)
    p.add_argument("-distance_model")
    p.add_argument("-di_seed", type=int, default=D.SEED)
    p.set_defaults(func=_cmd_process_query_data)

    p = sub.add_parser("get_chunks", description="Process a library of reference genome-skims or assemblies")
    p.add_argument("-input_dir")
    p.add_argument("-output_dir")
    _add_k(p)
    _add_p(p)
    p.add_argument("-pseudocount", action="store_true")
    p.set_defaults(func=_cmd_get_chunks)

    p = sub.add_parser("train_model_set_chunks", description="Trains individual models for each subtree using chunked genomes as input")
    p.add_argument("-input_dir")
    p.add_argument("-input_dir_fullgenomes")
    p.add_argument("-true_dist")
    p.add_argument("-subtrees")
    _add_train_common(p, D.DEFAULT_DI_EPOCHS)
    p.add_argument("-embed_sz", type=int, default=D.EMBEDDING_SIZE)
    p.add_argument("-clade", type=int, nargs="*")
    p.add_argument("-cap", action="store_true",
                   help="Reduces memory consuption for input dataset (caps k-mer frequences at maximum of 255)")
    p.add_argument("-o", help="Model output path")
    _add_resume(p)
    p.set_defaults(func=_cmd_train_model_set_chunks)

    p = sub.add_parser("train_classifier_chunks", description="Train classifier model based on backbone subtrees (genomes split into chunks)")
    p.add_argument("-input_dir")
    p.add_argument("-input_dir_fullgenomes")
    p.add_argument("-subtrees")
    _add_train_common(p, D.DEFAULT_CL_EPOCHS)
    p.add_argument("-mask", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("-cap", action="store_true")
    p.add_argument("-o", help="Model output path")
    _add_resume(p)
    p.set_defaults(func=_cmd_train_classifier_chunks)

    p = sub.add_parser("get_secondary_classes", description="Emit 2nd/3rd/4th-best classification outputs")
    p.add_argument("classes", help="Path to classes.out")
    p.set_defaults(func=_cmd_get_secondary_classes)

    # not in the reference (which re-invokes process_query_data per batch,
    # main.py:626-651): a persistent serving daemon that keeps models
    # device-resident between requests — see infer/serve.py
    p = sub.add_parser(
        "serve",
        description=(
            "Persistent placement server: JSON-lines requests on stdin, one "
            "JSON response per line on stdout; models stay device-resident "
            "between requests (commands: ping, warm, stats, place, "
            "place_features, quit)"
        ),
    )
    p.add_argument("-classifier_model", required=True)
    p.add_argument("-distance_model", required=True)
    _add_k(p)
    _add_p(p)
    p.add_argument("-pseudocount", action="store_true")
    p.add_argument("-cl_seed", type=int, default=D.SEED)
    p.add_argument("-di_seed", type=int, default=D.SEED)
    p.add_argument("-warm", action="store_true",
                   help="Preload every model to the device before accepting requests")
    p.add_argument("-request_timeout", type=float, default=0.0,
                   help="Per-request watchdog seconds: a request that wedges "
                        "(e.g. a stalled device transfer) is answered with "
                        "{ok: false} after this long and the daemon keeps "
                        "serving. 0 disables. Env: KF2VEC_SERVE_REQUEST_TIMEOUT_S")
    p.set_defaults(func=_cmd_serve)

    return parser


# subcommands that touch devices (everything else stays jax-import-free so
# --help / tree ops don't pay backend init or block on a cluster coordinator)
_DEVICE_COMMANDS = {
    "get_frequencies", "get_kmers", "get_chunks", "train_classifier",
    "train_model_set", "train_classifier_chunks", "train_model_set_chunks",
    "classify", "query", "build_library", "process_query_data", "serve",
}


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if getattr(args, "command", None) in _DEVICE_COMMANDS:
        from .parallel.mesh import initialize_distributed

        initialize_distributed()
    if hasattr(args, "func"):
        args.func(args)
    else:
        parser.print_help()


if __name__ == "__main__":
    main()
