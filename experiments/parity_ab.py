"""Measured A/B parity: this framework vs the reference's TF2 semantics.

Runs the continuous-Burgers problem twice from IDENTICAL initial
weights and train data:

  (A) this framework — float64, ``nt_line_search="none"`` (the
      reference's fixed-step L-BFGS rule, custom_lbfgs.py:159-163);
  (B) a TensorFlow-2 eager implementation of the reference's exact
      semantics, written fresh for this comparison: f64 Keras MLP with
      the same normalization, nested-GradientTape residual derivatives
      (reference 1d-burgers/inf_cont_burgers.py:65-90), Keras Adam with
      the same hp mapping, and a NumPy two-loop L-BFGS with the
      reference's step/memory rules (first step t = min(1, 1/sum|g|),
      then t = lr; curvature guard y.s > 1e-10; Hdiag = y.s/y.y —
      reference utils/custom_lbfgs.py:96-163).

Both sides share the weight codec element order, so side B is seeded
with side A's initial flat vector verbatim.  The script prints per-
iteration losses side-by-side and appends a measured section to
PARITY.md.  The same comparison runs as a slow-tier test
(tests/test_parity_ab.py).

Usage: ``python experiments/parity_ab.py [--adam N] [--lbfgs K]``
"""

from __future__ import annotations

import os
import sys

from _common import setup  # noqa: F401 (path side effect)

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAYERS = [2, 20, 20, 20, 20, 20, 20, 20, 20, 1]
NU = 0.01 / np.pi


# ---------------------------------------------------------------------------
# Side B: reference-semantics TF2 eager implementation (fresh code)
# ---------------------------------------------------------------------------

def build_tf_side(flat_w, lb, ub, X_u, u, X_f):
    """Returns (loss_and_flat_grad, adam_step, get_flat) closures."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import tensorflow as tf

    tf.keras.backend.set_floatx("float64")
    norm = 2.0 / (ub - lb)

    model = tf.keras.Sequential(
        [tf.keras.layers.InputLayer(input_shape=(2,)),
         tf.keras.layers.Lambda(lambda X: 2.0 * (X - lb) / (ub - lb) - 1.0)]
        + [tf.keras.layers.Dense(w, activation="tanh") for w in LAYERS[1:-1]]
        + [tf.keras.layers.Dense(LAYERS[-1])])

    def set_flat(w):
        idx = 0
        vals = []
        for v in model.trainable_variables:
            n = int(np.prod(v.shape))
            vals.append(np.asarray(w[idx:idx + n]).reshape(v.shape))
            idx += n
        assert idx == w.shape[0], (idx, w.shape)
        for v, val in zip(model.trainable_variables, vals):
            v.assign(val)

    def get_flat():
        return np.concatenate([np.asarray(v).ravel()
                               for v in model.trainable_variables])

    set_flat(flat_w)

    X_u_t = tf.constant(X_u)
    u_t_ = tf.constant(u)
    x_f = tf.constant(X_f[:, 0:1])
    t_f = tf.constant(X_f[:, 1:2])

    def loss_value():
        with tf.GradientTape(persistent=True) as tape:
            tape.watch(x_f)
            tape.watch(t_f)
            Xf = tf.concat([x_f, t_f], axis=1)
            up = model(Xf)
            u_x = tape.gradient(up, x_f)
        u_xx = tape.gradient(u_x, x_f)
        u_t = tape.gradient(up, t_f)
        del tape
        f = u_t + up * u_x - NU * u_xx
        return (tf.reduce_mean(tf.square(u_t_ - model(X_u_t)))
                + tf.reduce_mean(tf.square(f)))

    def loss_and_grad():
        import tensorflow as tf
        with tf.GradientTape() as outer:
            loss = loss_value()
        grads = outer.gradient(loss, model.trainable_variables)
        g = np.concatenate([np.asarray(gr).ravel() for gr in grads])
        return float(loss), g

    def loss_and_flat_grad(w):
        set_flat(w)
        return loss_and_grad()

    adam = None

    def adam_step(lr, b1, eps):
        nonlocal adam
        import tensorflow as tf
        if adam is None:
            adam = tf.keras.optimizers.Adam(lr, beta_1=b1, epsilon=eps)
        with tf.GradientTape() as outer:
            loss = loss_value()
        grads = outer.gradient(loss, model.trainable_variables)
        adam.apply_gradients(zip(grads, model.trainable_variables))
        return float(loss)

    return loss_and_flat_grad, adam_step, get_flat


def numpy_lbfgs_reference(loss_and_flat_grad, w0, n_iter, lr=0.8, m=50):
    """Two-loop L-BFGS with the reference's exact rules, in NumPy.

    Step: t = min(1, 1/sum|g|) on iteration 1, fixed ``lr`` after
    (reference custom_lbfgs.py:159-163).  Memory pair kept only when
    y.s > 1e-10 (:102); Hdiag = y.s / y.y (:114).  Returns the loss
    after each iteration.
    """
    w = w0.astype(np.float64).copy()
    f, g = loss_and_flat_grad(w)
    S, Y = [], []
    hdiag = 1.0
    losses = []
    d = None
    t = None
    g_old = None
    for it in range(n_iter):
        if it == 0:
            d = -g
        else:
            y = g - g_old
            s = t * d
            ys = float(y @ s)
            if ys > 1e-10:
                if len(S) == m:
                    S.pop(0)
                    Y.pop(0)
                S.append(s)
                Y.append(y)
                hdiag = ys / float(y @ y)
            q = -g
            al = []
            for s_i, y_i in zip(reversed(S), reversed(Y)):
                a_i = (s_i @ q) / (y_i @ s_i)
                q = q - a_i * y_i
                al.append(a_i)
            r = q * hdiag
            for (s_i, y_i), a_i in zip(zip(S, Y), reversed(al)):
                b_i = (y_i @ r) / (y_i @ s_i)
                r = r + (a_i - b_i) * s_i
            d = r
        t = min(1.0, 1.0 / float(np.abs(g).sum())) if it == 0 else lr
        g_old = g
        w = w + t * d
        f, g = loss_and_flat_grad(w)
        losses.append(f)
    return np.array(losses), w


# ---------------------------------------------------------------------------
# Side A: this framework
# ---------------------------------------------------------------------------

def run_ours(flat_w, lb, ub, X_u, u, X_f, n_iter, lr=0.8):
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from pinn import params as pcodec
    from pinn.models import mlp
    from pinn.optim import lbfgs as lbopt
    from pinn.problems import burgers

    dtype = jnp.float64
    params0 = mlp.init_mlp(jax.random.PRNGKey(0), LAYERS, dtype)
    unravel = pcodec.make_unravel(params0)
    lb_j, ub_j = jnp.asarray(lb, dtype), jnp.asarray(ub, dtype)
    batch = {"X_u": jnp.asarray(X_u, dtype), "u": jnp.asarray(u, dtype),
             "X_f": jnp.asarray(X_f, dtype)}

    def loss_fn(p, b):
        return burgers.loss_cont_inference(p, b["X_u"], b["u"], b["X_f"],
                                           lb_j, ub_j, NU)

    def opfunc(w, b):
        return jax.value_and_grad(lambda w_: loss_fn(unravel(w_), b))(w)

    config = lbopt.LbfgsConfig(learning_rate=lr, max_iter=n_iter,
                               n_correction=50, line_search="none")
    state = lbopt.lbfgs_init(opfunc, jnp.asarray(flat_w, dtype), config,
                             batch)
    run = lbopt.make_lbfgs_run(opfunc, config)
    losses = []
    done = 0
    while done < n_iter:
        chunk = min(10, n_iter - done)
        state, f_hist = run(state, batch, chunk)
        losses.extend(float(x) for x in f_hist)
        done += chunk
    return np.array(losses[:n_iter]), np.asarray(state.x)


def main(n_adam=0, n_lbfgs=50):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from pinn.data import burgers_cont_inference
    from pinn.models import mlp
    from pinn import params as pcodec

    np.random.seed(1234)
    data = burgers_cont_inference(100, 10000)
    lb, ub = data.lb, data.ub

    params0 = mlp.init_mlp(jax.random.PRNGKey(1234), LAYERS, jnp.float64)
    flat0 = np.asarray(pcodec.ravel(params0))

    ours, w_a = run_ours(flat0, lb, ub, data.X_u_train, data.u_train,
                         data.X_f, n_lbfgs)

    tf_lag, tf_adam, tf_get = build_tf_side(
        flat0, lb, ub, data.X_u_train, data.u_train, data.X_f)
    theirs, w_b = numpy_lbfgs_reference(tf_lag, flat0, n_lbfgs)

    rel = np.abs(ours - theirs) / np.abs(theirs)
    print("iter   ours            reference-TF2    rel-dev")
    for i in list(range(min(5, n_lbfgs))) + [9, 19, 29, 49]:
        if i < n_lbfgs:
            print(f"{i+1:4d}   {ours[i]:.10e}  {theirs[i]:.10e}  "
                  f"{rel[i]:.2e}")
    print(f"max rel deviation over {n_lbfgs} iters: {rel.max():.3e}")
    print(f"final flat-weight max |delta|: "
          f"{np.max(np.abs(w_a - w_b)):.3e}")

    with open(os.path.join(REPO, "PARITY.md"), "a") as fh:
        fh.write(
            "\n## Measured A/B: L-BFGS trajectory vs TF2 reference "
            "semantics\n\n"
            f"Equal schedule ({n_lbfgs} fixed-step L-BFGS iters, f64, "
            "identical init + train data, `nt_line_search: none`), "
            "side B = fresh TF2-eager implementation of the reference "
            "semantics (`experiments/parity_ab.py`).\n\n"
            "| iter | ours | TF2 reference semantics | rel dev |\n"
            "|---|---|---|---|\n")
        for i in [0, 4, 9, 24, n_lbfgs - 1]:
            if i < n_lbfgs:
                fh.write(f"| {i+1} | {ours[i]:.10e} | {theirs[i]:.10e} "
                         f"| {rel[i]:.2e} |\n")
        fh.write(f"\nMax rel loss deviation: **{rel.max():.3e}**; final "
                 f"flat-weight max abs delta: {np.max(np.abs(w_a - w_b)):.3e}."
                 "\n")
    return rel.max()


if __name__ == "__main__":
    n_adam = int(sys.argv[sys.argv.index("--adam") + 1]) \
        if "--adam" in sys.argv else 0
    n_lbfgs = int(sys.argv[sys.argv.index("--lbfgs") + 1]) \
        if "--lbfgs" in sys.argv else 50
    main(n_adam, n_lbfgs)
