Feature: ExistsParams2

  Background:
    Given an empty graph
    And having executed:
      """
      CREATE (a:U {name: 'ann', age: 30}), (b:U {name: 'bob', age: 20}),
             (c:U {name: 'cat', age: 40}),
             (g1:Grp {tag: 'x'}), (g2:Grp {tag: 'y'}),
             (a)-[:IN]->(g1), (b)-[:IN]->(g1), (b)-[:IN]->(g2)
      """

  Scenario: EXISTS subquery as a WHERE conjunct
    When executing query:
      """
      MATCH (u:U) WHERE EXISTS { (u)-[:IN]->(:Grp {tag: 'y'}) }
      RETURN u.name AS name
      """
    Then the result should be, in any order:
      | name  |
      | 'bob' |
    And no side effects

  Scenario: NOT EXISTS pattern keeps the unconnected
    When executing query:
      """
      MATCH (u:U) WHERE NOT (u)-[:IN]->(:Grp)
      RETURN u.name AS name
      """
    Then the result should be, in any order:
      | name  |
      | 'cat' |
    And no side effects

  Scenario: exists() function form with a pattern
    When executing query:
      """
      MATCH (u:U) WHERE exists((u)-[:IN]->())
      RETURN u.name AS name
      """
    Then the result should be, in any order:
      | name  |
      | 'ann' |
      | 'bob' |
    And no side effects

  Scenario: EXISTS with an inner WHERE
    When executing query:
      """
      MATCH (u:U) WHERE EXISTS { (u)-[:IN]->(g:Grp) WHERE g.tag = 'x' }
      RETURN u.name AS name
      """
    Then the result should be, in any order:
      | name  |
      | 'ann' |
      | 'bob' |
    And no side effects

  Scenario: Pattern predicate in a boolean expression position
    When executing query:
      """
      MATCH (u:U)
      RETURN u.name AS name, (u)-[:IN]->(:Grp {tag: 'y'}) AS in_y
      """
    Then the result should be, in any order:
      | name  | in_y  |
      | 'ann' | false |
      | 'bob' | true  |
      | 'cat' | false |
    And no side effects

  Scenario: Pattern predicate under OR
    When executing query:
      """
      MATCH (u:U)
      WHERE (u)-[:IN]->(:Grp {tag: 'y'}) OR u.age > 35
      RETURN u.name AS name
      """
    Then the result should be, in any order:
      | name  |
      | 'bob' |
      | 'cat' |
    And no side effects

  Scenario: String parameter in a predicate
    And parameters are:
      | who | 'ann' |
    When executing query:
      """
      MATCH (u:U {name: $who}) RETURN u.age AS age
      """
    Then the result should be, in any order:
      | age |
      | 30  |
    And no side effects

  Scenario: Numeric parameter in arithmetic
    And parameters are:
      | bump | 5 |
    When executing query:
      """
      MATCH (u:U {name: 'bob'}) RETURN u.age + $bump AS v
      """
    Then the result should be, in any order:
      | v  |
      | 25 |
    And no side effects

  Scenario: List parameter with IN
    And parameters are:
      | names | ['ann', 'cat'] |
    When executing query:
      """
      MATCH (u:U) WHERE u.name IN $names RETURN u.age AS age
      """
    Then the result should be, in any order:
      | age |
      | 30  |
      | 40  |
    And no side effects

  Scenario: Null parameter comparisons produce no rows
    And parameters are:
      | x | null |
    When executing query:
      """
      MATCH (u:U) WHERE u.age > $x RETURN u.name AS name
      """
    Then the result should be empty
    And no side effects

  Scenario: DISTINCT entities by identity not properties
    Given an empty graph
    And having executed:
      """
      CREATE (:D {v: 1}), (:D {v: 1})
      """
    When executing query:
      """
      MATCH (d:D) RETURN DISTINCT d
      """
    Then the result should be, in any order:
      | d         |
      | (:D {v: 1}) |
      | (:D {v: 1}) |
    And no side effects

  Scenario: DISTINCT on projected values collapses equal rows
    Given an empty graph
    And having executed:
      """
      CREATE (:D {v: 1}), (:D {v: 1}), (:D {v: 2})
      """
    When executing query:
      """
      MATCH (d:D) RETURN DISTINCT d.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 1 |
      | 2 |
    And no side effects
