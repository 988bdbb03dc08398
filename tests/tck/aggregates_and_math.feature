Feature: AggregatesAndMath

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (:N {x: 1.0}), (:N {x: 2.0}), (:N {x: 3.0}), (:N {x: 4.0})
      """

  Scenario: percentileCont interpolates
    When executing query:
      """
      MATCH (n:N) RETURN percentileCont(n.x, 0.5) AS p
      """
    Then the result should be, in any order:
      | p   |
      | 2.5 |
    And no side effects

  Scenario: percentileDisc picks an element
    When executing query:
      """
      MATCH (n:N)
      RETURN percentileDisc(n.x, 0.5) AS p50, percentileDisc(n.x, 1.0) AS p100
      """
    Then the result should be, in any order:
      | p50 | p100 |
      | 2.0 | 4.0  |
    And no side effects

  Scenario: stDev is the sample standard deviation
    When executing query:
      """
      MATCH (n:N) RETURN toInteger(round(stDev(n.x) * 10000)) AS s
      """
    Then the result should be, in any order:
      | s     |
      | 12910 |
    And no side effects

  Scenario: stDevP is the population standard deviation
    When executing query:
      """
      MATCH (n:N) RETURN toInteger(round(stDevP(n.x) * 10000)) AS s
      """
    Then the result should be, in any order:
      | s     |
      | 11180 |
    And no side effects

  Scenario: single predicate over lists
    When executing query:
      """
      RETURN single(x IN [1, 2, 3] WHERE x > 2) AS one,
             single(x IN [1, 2, 3] WHERE x > 1) AS two,
             single(x IN [] WHERE x > 0) AS zero
      """
    Then the result should be, in any order:
      | one  | two   | zero  |
      | true | false | false |
    And no side effects

  Scenario: atan2 and pi
    When executing query:
      """
      RETURN toInteger(round(atan2(1.0, 1.0) * 100000)) AS a,
             toInteger(round(pi() * 100000)) AS p
      """
    Then the result should be, in any order:
      | a     | p      |
      | 78540 | 314159 |
    And no side effects

  Scenario: haversin and cot rewrites
    When executing query:
      """
      RETURN haversin(0.0) AS h, toInteger(round(cot(pi() / 4))) AS c
      """
    Then the result should be, in any order:
      | h   | c |
      | 0.0 | 1 |
    And no side effects

  Scenario: XOR ternary truth table
    When executing query:
      """
      RETURN true XOR false AS tf, true XOR true AS tt,
             true XOR null AS tn, false XOR null AS fn
      """
    Then the result should be, in any order:
      | tf   | tt    | tn   | fn   |
      | true | false | null | null |
    And no side effects

  Scenario: percentile aggregates group correctly
    When executing query:
      """
      MATCH (n:N) WITH n.x AS x, CASE WHEN n.x < 3 THEN 'lo' ELSE 'hi' END AS b
      RETURN b, percentileCont(x, 0.5) AS med ORDER BY b
      """
    Then the result should be, in order:
      | b    | med |
      | 'hi' | 3.5 |
      | 'lo' | 1.5 |
    And no side effects
