package graft.model

/** Client-shaped API parity with `PatientSimilarityClient`
  * (similarity_search.py:169-260, a `fl.client.NumPyClient` subclass whose
  * server is never launched — the reference drives it directly, and so do
  * we from [[FederatedTrainer]]).
  *
  * Local, driver-free object: `fit` = M2 local training, `evaluate` = M5
  * embedding-variance metric, parameters travel as the flat double vector
  * (the reference's list-of-ndarrays). Inside Spark this runs per shard in
  * a `mapGroups` task; standalone it is usable for unit-level parity.
  */
final case class ShardClient(shardId: String, features: Array[Array[Double]]) {

  /** get_parameters (similarity_search.py:202-204). */
  def getParameters(model: Mlp.Weights): Array[Double] = model.flatten

  /** set_parameters (similarity_search.py:206-210). */
  def setParameters(flat: Array[Double]): Mlp.Weights = Mlp.unflatten(flat)

  /** fit (similarity_search.py:212-248): local epochs on the Gram loss;
    * returns (new parameters, n_samples, final loss) like the NumPyClient
    * contract's (parameters, num_examples, metrics).
    */
  def fit(parameters: Array[Double], localEpochs: Int = 5): (Array[Double], Long, Double) = {
    val (wts, losses) = Mlp.localFit(Mlp.unflatten(parameters), features,
      epochs = localEpochs)
    (wts.flatten, features.length.toLong,
      if (losses.nonEmpty) losses.last else Double.NaN)
  }

  /** evaluate (similarity_search.py:250-260): sample variance over every
    * element of the shard's embedding matrix (torch.var default).
    */
  def evaluate(parameters: Array[Double]): (Double, Long) = {
    val wts = Mlp.unflatten(parameters)
    val flat = features.iterator
      .flatMap(x => Mlp.forward(wts, x.map(_.toFloat)))
      .map(_.toDouble).toArray
    if (flat.length < 2) return (0.0, features.length.toLong)
    val mean = flat.sum / flat.length
    val varS = flat.map(v => (v - mean) * (v - mean)).sum / (flat.length - 1)
    (varS, features.length.toLong)
  }
}
